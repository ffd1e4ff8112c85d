"""Data pipeline (the data/ analog) — string-keyed dataset factory
(data/__init__.py:14-21 contract), plus 'synthetic' for zero-egress runs."""

from .shuffle import BatchLoader, ShuffleDataset
from .text import HFTextDataset, SyntheticTokenDataset, TokenDataset
from .tokenizers import get_tokenizer


def get_dataset(type: str, eval: bool = False, **kwargs):
    ds_cls = dict(
        token=TokenDataset,
        hf_text=HFTextDataset,
        synthetic=SyntheticTokenDataset,
    )[type]
    return ds_cls(eval=eval, **kwargs)


__all__ = [
    "get_dataset",
    "get_tokenizer",
    "TokenDataset",
    "HFTextDataset",
    "SyntheticTokenDataset",
    "ShuffleDataset",
    "BatchLoader",
]
