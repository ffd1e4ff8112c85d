"""Multiple-choice eval tasks (mc_eval.py): formats, masking, scoring."""

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from mc_eval import FORMATS, evaluate_mc, make_predict, tokenize_mc
from quantized_training_tpu.models import llama

TINY = llama.LlamaConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=4,
    max_position_embeddings=64,
)


def byte_tok(s: str):
    return [b % 256 for b in s.encode()]


def test_formats_parse():
    ctx, choices, gold = FORMATS["arc"](
        {
            "question": "What is 2+2?",
            "choices": {"text": ["3", "4"], "label": ["A", "B"]},
            "answerKey": "B",
        }
    )
    assert gold == 1 and len(choices) == 2 and "2+2" in ctx

    ctx, choices, gold = FORMATS["piqa"](
        {"goal": "open a jar", "sol1": "twist the lid", "sol2": "eat it", "label": 0}
    )
    assert gold == 0 and len(choices) == 2

    ctx, choices, gold = FORMATS["mc"](
        {"ctx": "Q", "choices": ["a", "b", "c"], "gold": 2}
    )
    assert gold == 2 and len(choices) == 3


def test_continuation_only_scoring():
    """Context tokens are excluded from the choice loss (score_mask)."""
    rows = [{"ctx": "same context", "choices": [" aa", " bb"], "gold": 0}]
    tokens, score_mask, gold, valid = tokenize_mc(rows, FORMATS["mc"], byte_tok)
    ctx_len = len(byte_tok("same context"))
    # no scored position inside the shared context
    assert not score_mask[0, :, :ctx_len].any()
    # each choice scores exactly its own continuation tokens
    assert score_mask[0, 0].sum() == len(byte_tok(" aa"))
    assert valid.all()


def test_padded_choice_never_selected():
    """Rows with fewer choices than the task max can't predict a pad slot."""
    rows = [
        {"ctx": "q1", "choices": [" a", " b", " c", " d"], "gold": 0},
        {"ctx": "q2", "choices": [" a", " b"], "gold": 1},
    ]
    tokens, score_mask, gold, valid = tokenize_mc(rows, FORMATS["mc"], byte_tok)
    assert valid[1].tolist() == [True, True, False, False]

    params = llama.init_params(jax.random.PRNGKey(0), TINY)
    predict = make_predict(TINY)
    preds = np.asarray(
        predict(
            params,
            jnp.asarray(tokens),
            jnp.asarray(score_mask),
            jnp.asarray(valid),
        )
    )
    assert preds[1] < 2


def test_evaluate_mc_end_to_end(tmp_path):
    rows = [
        {"ctx": f"question {i}", "choices": [" yes", " no", " maybe"], "gold": i % 3}
        for i in range(7)
    ]
    path = tmp_path / "mc.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in rows))
    params = llama.init_params(jax.random.PRNGKey(0), TINY)
    acc = evaluate_mc(params, TINY, "mc", str(path), tokenizer=byte_tok, batch_size=4)
    assert 0.0 <= acc <= 1.0
    # Regression (ADVICE r2): the 7 % 4 = 3 tail rows used to be silently
    # dropped whenever the dataset was >= one batch. Accuracy must be
    # computed over ALL rows — identical to running everything in one batch.
    acc_full = evaluate_mc(
        params, TINY, "mc", str(path), tokenizer=byte_tok, batch_size=7
    )
    assert acc == acc_full


def test_markov_mc_generation_and_learnability(tmp_path):
    """The generated Markov MC task is solvable by a model trained on the
    chain and at the chance floor for an untrained one — the property the
    accuracy-parity runs (README convergence section) rely on."""
    from mc_eval import generate_markov_mc

    path = str(tmp_path / "markov_mc.jsonl")
    generate_markov_mc(
        path, n_rows=24, prompt_len=12, cont_len=4, n_choices=4,
        vocab_size=TINY.vocab_size, n_states=64, branching=4,
    )
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) == 24
    assert all(len(r["choices"]) == 4 for r in rows)
    assert all(0 <= r["gold"] < 4 for r in rows)

    # train a tiny model on the SAME chain for a few hundred steps
    from quantized_training_tpu import optim, quant
    from quantized_training_tpu.data.text import MarkovTokenDataset
    from quantized_training_tpu.data import BatchLoader
    from quantized_training_tpu.train import init_train_state, make_train_step

    ds = MarkovTokenDataset(
        seq_len=32, vocab_size=TINY.vocab_size, n_states=64, branching=4
    )
    loader = iter(BatchLoader(ds, batch_size=16))
    params = llama.init_params(jax.random.PRNGKey(0), TINY)
    qparams = quant.quantize_params(params, "mixed_precision")
    opt = optim.adamw_bf16_sr(bf16_stochastic_rounding=False)
    state = init_train_state(qparams, opt)
    step = make_train_step(TINY, opt, donate=False)
    for i in range(300):
        tok, lab = next(loader)
        state, metrics = step(
            state, jnp.asarray(tok), jnp.asarray(lab), 3e-3,
            jax.random.PRNGKey(i),
        )

    acc_untrained = evaluate_mc(
        params, TINY, "mc", path, tokenizer="ints", batch_size=8
    )
    trained = quant.merge_masters(
        quant.virtual_params(state.params), state.params
    )
    acc_trained = evaluate_mc(
        trained, TINY, "mc", path, tokenizer="ints", batch_size=8
    )
    assert acc_untrained < 0.6  # near the 0.25 chance floor
    assert acc_trained >= 0.75, (acc_untrained, acc_trained)
