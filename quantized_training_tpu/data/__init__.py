"""Data pipeline (the data/ analog) — string-keyed dataset factory
(data/__init__.py:14-21 contract), plus 'synthetic' for zero-egress runs."""

from .image import (
    HFImageDataset,
    SyntheticImageDataset,
    WebDataset,
    decode_image,
    eval_transform,
    train_transform,
)
from .shuffle import BatchLoader, ShuffleDataset
from .text import HFTextDataset, MarkovTokenDataset, SyntheticTokenDataset, TokenDataset
from .tokenizers import get_tokenizer


def get_dataset(type: str, eval: bool = False, **kwargs):
    ds_cls = dict(
        token=TokenDataset,
        hf_text=HFTextDataset,
        synthetic=SyntheticTokenDataset,
        markov=MarkovTokenDataset,
        hf_image=HFImageDataset,
        wds=WebDataset,
        synthetic_image=SyntheticImageDataset,
    )[type]
    return ds_cls(eval=eval, **kwargs)


__all__ = [
    "get_dataset",
    "get_tokenizer",
    "TokenDataset",
    "HFTextDataset",
    "SyntheticTokenDataset",
    "MarkovTokenDataset",
    "ShuffleDataset",
    "BatchLoader",
    "HFImageDataset",
    "WebDataset",
    "SyntheticImageDataset",
    "decode_image",
    "train_transform",
    "eval_transform",
]
