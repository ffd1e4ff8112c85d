"""Two-process ``jax.distributed`` validation of the multi-host contracts.

Everything multi-host in the repo — file-per-process checkpoints
(utils/checkpoint.py), ``process_index``-sharded data loading, and
``shard_batch``'s local-data assembly — is normally only exercised with
``jax.process_count() == 1``.  This test spawns TWO real processes that
form a distributed CPU cluster (4 virtual devices each → one global
8-device fsdp mesh) and checks, end to end, that

  train 5 steps  ==  train 3 steps → per-process sharded checkpoint →
                     restart → restore → train 2 steps

is BIT-exact on every process's local shards.  This is the offline proxy
for the reference's multi-node DDP runs (SURVEY.md §2.3, distributed
checkpoint row; reference ``llm_pretrain.py`` single-file-per-rank save).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "multiproc_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_phase(phase: str, workdir: str, port: int, timeout: float = 420.0):
    """Launch both ranks, wait, return their parsed outputs [rank0, rank1]."""
    env = dict(os.environ)
    # Each process gets its OWN 4 virtual CPU devices (override the
    # suite's 8-device flag; the worker uses setdefault so the driver
    # must set it explicitly).
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(pid), phase, workdir],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"phase {phase}: worker timed out")
        logs.append(out)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"phase {phase} rank {pid} failed:\n{log}"
    outs = []
    for pid in (0, 1):
        with open(Path(workdir) / f"out_{phase}_{pid}.json") as f:
            outs.append(json.load(f))
    return outs


@pytest.mark.slow
def test_two_process_train_checkpoint_resume(tmp_path):
    workdir = str(tmp_path)
    port = _free_port()

    full = _run_phase("full", workdir, port)
    assert full[0]["loss"] == full[1]["loss"]  # SPMD: same global loss

    _run_phase("train", workdir, _free_port())
    # both ranks wrote their own checkpoint file
    assert (tmp_path / "last_0.pkl").exists()
    assert (tmp_path / "last_1.pkl").exists()

    resume = _run_phase("resume", workdir, _free_port())

    # interrupted+resumed must be bit-exact vs uninterrupted, per rank
    for pid in (0, 1):
        assert resume[pid]["digest"] == full[pid]["digest"], (
            f"rank {pid}: resumed state diverged from uninterrupted run"
        )
    assert resume[0]["loss"] == full[0]["loss"]
