"""Offline tokenizer -> uint16 .bin memmap shards (tokenize_data.py analog).

Parity with the reference: TinyStories (single shard per split,
tokenize_data.py:11-28) and C4-realnewslike (200M-token shards, :31-57),
uint16 memmap output consumed by data.TokenDataset, and a COMPLETE marker
for idempotency (:72-85).

Zero-egress addition: ``--dataset textfile --input <glob>`` tokenizes local
text files (one document per line) so the pipeline runs without the HF hub.
The default tokenizer is llama3 (tiktoken) since sentencepiece is not
available in this environment; vocab fits uint16 only for llama2, so
llama3 output uses uint32 .bin files (TokenDataset dtype flag).
"""

from __future__ import annotations

import argparse
import glob
from pathlib import Path

import numpy as np

from quantized_training_tpu.data.tokenizers import get_tokenizer

MARKER = "COMPLETE"


def _write_shard(tokens: list[int], path: Path, dtype) -> None:
    arr = np.asarray(tokens, dtype=dtype)
    arr.tofile(path)
    print(f"wrote {path} ({len(arr):,} tokens)")


def process_textfiles(inputs: list[str], save_dir: Path, tokenizer, dtype, shard_size: int) -> None:
    tokens: list[int] = []
    shard_idx = 0
    for pattern in inputs:
        for fname in sorted(glob.glob(pattern)):
            with open(fname) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    tokens.extend(tokenizer(line, add_bos=True, add_eos=True))
                    while len(tokens) >= shard_size:
                        _write_shard(
                            tokens[:shard_size],
                            save_dir / f"shard_{shard_idx:04d}.bin",
                            dtype,
                        )
                        tokens = tokens[shard_size:]
                        shard_idx += 1
    if tokens:
        _write_shard(tokens, save_dir / f"shard_{shard_idx:04d}.bin", dtype)


def process_tinystories(save_dir: Path, tokenizer, dtype, split: str) -> None:
    """TinyStories: one shard per split (tokenize_data.py:11-28)."""
    from datasets import load_dataset

    ds = load_dataset("roneneldan/TinyStories", split=split)
    tokens: list[int] = []
    for row in ds:
        tokens.extend(tokenizer(row["text"], add_bos=True, add_eos=True))
    _write_shard(tokens, save_dir / f"{split}.bin", dtype)


def process_c4_realnewslike(save_dir: Path, tokenizer, dtype, split: str, shard_size: int) -> None:
    """C4 realnewslike: fixed-size shards (tokenize_data.py:31-57)."""
    from datasets import load_dataset

    ds = load_dataset("allenai/c4", "realnewslike", split=split, streaming=True)
    tokens: list[int] = []
    shard_idx = 0
    for row in ds:
        tokens.extend(tokenizer(row["text"], add_bos=True, add_eos=True))
        while len(tokens) >= shard_size:
            _write_shard(tokens[:shard_size], save_dir / f"{split}_{shard_idx:04d}.bin", dtype)
            tokens = tokens[shard_size:]
            shard_idx += 1


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="textfile",
                        choices=["textfile", "tinystories", "c4_realnewslike"])
    parser.add_argument("--input", nargs="+", help="glob(s) for --dataset textfile")
    parser.add_argument("--split", default="train")
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--tokenizer", default="llama3")
    parser.add_argument("--tokenizer_path")
    parser.add_argument("--shard_size", type=int, default=200_000_000)
    args = parser.parse_args()

    save_dir = Path(args.save_dir)
    marker = save_dir / MARKER
    if marker.exists():  # idempotency (tokenize_data.py:72-85)
        print(f"{save_dir} already COMPLETE; nothing to do")
        return
    save_dir.mkdir(parents=True, exist_ok=True)

    tokenizer = get_tokenizer(args.tokenizer, args.tokenizer_path)
    # llama2 vocab (32k) fits uint16 like the reference; llama3 (128k) does
    # not -> uint32 (TokenDataset reads dtype from a sidecar file)
    dtype = np.uint16 if tokenizer.vocab_size <= 65535 else np.uint32
    (save_dir / "dtype.txt").write_text(np.dtype(dtype).name)

    if args.dataset == "textfile":
        assert args.input, "--input required for textfile"
        process_textfiles(args.input, save_dir, tokenizer, dtype, args.shard_size)
    elif args.dataset == "tinystories":
        process_tinystories(save_dir, tokenizer, dtype, args.split)
    else:
        process_c4_realnewslike(save_dir, tokenizer, dtype, args.split, args.shard_size)

    marker.touch()
    print(f"done -> {save_dir}")


if __name__ == "__main__":
    main()
