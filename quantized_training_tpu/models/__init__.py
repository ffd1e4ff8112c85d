from . import llama
from .llama import LLAMA2_1B, LLAMA2_470M, LlamaConfig

__all__ = ["llama", "LlamaConfig", "LLAMA2_470M", "LLAMA2_1B"]
