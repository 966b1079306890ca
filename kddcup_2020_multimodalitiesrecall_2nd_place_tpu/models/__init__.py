from . import heads, imagebert_a, imagebert_b, lxmert
from .core import BertConfig, Params, Precision
from .lxmert import LxmertConfig
from .registry import ENSEMBLE_WEIGHTS, MODEL_NAMES, ModelSpec, get_model

__all__ = [
    "BertConfig",
    "ENSEMBLE_WEIGHTS",
    "LxmertConfig",
    "MODEL_NAMES",
    "ModelSpec",
    "Params",
    "Precision",
    "get_model",
    "heads",
    "imagebert_a",
    "imagebert_b",
    "lxmert",
]
