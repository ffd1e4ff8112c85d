"""HellaSwag in-training eval (hellaswag.py analog).

Parity with the reference: 4-choice min-summed-CE classification over a
FIXED-shape (N, 4, max_len) token tensor so the jitted predict function
never recompiles (hellaswag.py:39-44), preprocessing regexes from
lm-evaluation-harness (hellaswag.py:14-20).

Zero-egress note: the reference streams Rowan/hellaswag from the HF hub
(hellaswag.py:44); here the dataset may also be a local JSON/JSONL path
(each row: ctx_a, ctx_b, activity_label, endings, label).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def preprocess(text: str) -> str:
    text = text.strip()
    text = text.replace(" [title]", ". ")
    text = re.sub(r"\[.*?\]", "", text)
    text = text.replace("  ", " ")
    return text


def _load_rows(split: str, data_path: str | None):
    if data_path is not None:
        rows = []
        with open(data_path) as f:
            if str(data_path).endswith(".jsonl"):
                for line in f:
                    rows.append(json.loads(line))
            else:
                rows = json.load(f)
        return rows
    from datasets import load_dataset

    return load_dataset("Rowan/hellaswag", split=split)


def tokenize_rows(rows, tokenizer, max_len: int = 193) -> tuple[np.ndarray, np.ndarray]:
    """-> tokens [N, 4, max_len] (pad = -100), labels [N]."""
    tokens = np.full((len(rows), 4, max_len), -100, dtype=np.int64)
    labels = np.zeros(len(rows), dtype=np.int64)
    for i, row in enumerate(rows):
        ctx = f"{row['activity_label']}: {row['ctx_a']} {row['ctx_b'].capitalize()}"
        for j, ending in enumerate(row["endings"]):
            toks = tokenizer(preprocess(f"{ctx} {ending}"))
            assert len(toks) <= max_len, len(toks)
            tokens[i, j, : len(toks)] = toks
        labels[i] = int(row["label"])
    return tokens, labels


def make_predict(cfg):
    """Jitted batched 4-choice predictor (hellaswag.py:23-35)."""
    from quantized_training_tpu.models import llama

    @jax.jit
    def predict(params, data):
        N, n_choices, seq_len = data.shape
        inputs = data[..., :-1].reshape(N * n_choices, seq_len - 1)
        # pad positions (-100) become token 0 for the forward pass
        logits = llama.forward(
            params, jnp.maximum(inputs, 0).astype(jnp.int32), cfg
        ).astype(jnp.float32)

        labels = data[..., 1:].reshape(N * n_choices, seq_len - 1)
        valid = labels != -100
        safe = jnp.maximum(labels, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        loss = nll.reshape(N, n_choices, seq_len - 1).sum(-1)
        return jnp.argmin(loss, axis=-1)

    return predict


def evaluate_hellaswag(
    params,
    cfg,
    tokenizer: str = "llama3",
    split: str = "validation",
    data_path: str | None = None,
    batch_size: int = 8,
    max_rows: int | None = None,
) -> float:
    from quantized_training_tpu.data import get_tokenizer

    rows = _load_rows(split, data_path)
    if max_rows is not None:
        rows = rows[:max_rows] if isinstance(rows, list) else rows.select(range(max_rows))
    tok = get_tokenizer(tokenizer) if isinstance(tokenizer, str) else tokenizer
    tokens, labels = tokenize_rows(rows, tok)

    predict = make_predict(cfg)
    n_correct = 0
    n = len(tokens) - len(tokens) % batch_size  # fixed shape, no ragged tail
    for i in range(0, n, batch_size):
        preds = predict(params, jnp.asarray(tokens[i : i + batch_size]))
        n_correct += int((np.asarray(preds) == labels[i : i + batch_size]).sum())
    return n_correct / max(n, 1)
