"""Driver-level checkpoint/resume integration test: an interrupted
llm_pretrain run resumed from its checkpoint produces the same loss
trajectory as an uninterrupted run (model + optimizer + dataloader
state all restored — the llm_pretrain.py:239-249 / :173-179 contract)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run(args, cwd):
    proc = subprocess.run(
        [sys.executable, str(REPO / "llm_pretrain.py"), *args],
        capture_output=True, text=True, cwd=cwd, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc


def _losses(run_dir: Path):
    rows = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    return {r["step"]: r["loss"] for r in rows}


@pytest.mark.slow
def test_resume_matches_uninterrupted(tmp_path):
    common = [
        "--model", "llama2-470m",
        "--model_kwargs", json.dumps(dict(
            num_hidden_layers=2, hidden_size=128, intermediate_size=128,
            num_attention_heads=2, num_key_value_heads=2, vocab_size=256,
        )),
        "--train_ds", json.dumps(dict(type="markov", vocab_size=256, n_states=32)),
        "--quantize", "int8_quantized_training",
        "--batch_size", "2", "--seq_len", "32",
        "--lr", "1e-3", "--log_interval", "1", "--cpu",
        "--save_dir", str(tmp_path / "runs"),
    ]

    # uninterrupted: 6 steps
    _run([*common, "--n_steps", "6", "--ckpt_interval", "100", "--run_name", "full"], tmp_path)
    full = _losses(next((tmp_path / "runs").glob("*full")))

    # interrupted: 3 steps with a checkpoint, then resume to 6
    _run([*common, "--n_steps", "3", "--ckpt_interval", "3", "--run_name", "part1"], tmp_path)
    part1_dir = next((tmp_path / "runs").glob("*part1"))
    ckpt = part1_dir / "last.pkl"
    assert ckpt.exists()
    _run([*common, "--n_steps", "6", "--ckpt_interval", "100",
          "--resume", str(ckpt), "--run_name", "part2"], tmp_path)
    part2 = _losses(next((tmp_path / "runs").glob("*part2")))

    for step in (4, 5, 6):
        assert step in part2, (step, sorted(part2))
        assert abs(part2[step] - full[step]) < 5e-3, (step, part2[step], full[step])
