from .activations import ACTIVATIONS, gelu_erf, gelu_tanh
from .attention import mask_to_bias, merge_heads, mha_xla, split_heads

__all__ = [
    "ACTIVATIONS",
    "gelu_erf",
    "gelu_tanh",
    "mask_to_bias",
    "merge_heads",
    "mha_xla",
    "split_heads",
]
