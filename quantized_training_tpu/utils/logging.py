"""Metrics logging: JSONL file + stdout (wandb used by the reference,
llm_pretrain.py:164-170, is gated behind availability/egress here)."""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricLogger:
    def __init__(self, save_dir: str | Path | None, enabled: bool = True):
        self.enabled = enabled
        self.path = None
        if save_dir is not None and enabled:
            Path(save_dir).mkdir(parents=True, exist_ok=True)
            self.path = Path(save_dir) / "metrics.jsonl"
            self._f = open(self.path, "a")

    def log(self, metrics: dict, step: int) -> None:
        if not self.enabled:
            return
        rec = {"step": step, "ts": time.time(), **metrics}
        if self.path is not None:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()

    def finish(self) -> None:
        if self.path is not None:
            self._f.close()
