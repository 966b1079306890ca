"""Model registry: the four reference scorers as configs of one family.

Ensemble weights follow ``code/main.py:59``:
merge = 0.2*B + 0.2*C + 0.3*A + 0.3*LXMERT.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax

from .. import BERT_CONFIG_PATH
from . import imagebert_a, imagebert_b, lxmert
from .core import BertConfig, Params, Precision
from .lxmert import LxmertConfig

ENSEMBLE_WEIGHTS = {
    "imagebert_a": 0.3,
    "imagebert_b": 0.2,
    "imagebert_c": 0.2,
    "lxmert": 0.3,
}


@dataclass(frozen=True)
class ModelSpec:
    name: str
    config: Any
    init: Callable[[jax.Array], Params]
    apply: Callable[..., dict]
    featurizer_layout: str  # which Featurizer method builds its batches
    sen2forest: bool = False

    def init_params(self, rng: jax.Array) -> Params:
        # jit: initialisation is dozens of truncated-normal ops; one fused
        # program instead of per-op dispatch (slow on this host's backends)
        if not hasattr(self, "_jit_init"):
            object.__setattr__(self, "_jit_init", jax.jit(self.init))
        return self._jit_init(rng)

    def score(self, params: Params, batch: dict, prec: Precision = Precision.f32()):
        return self.apply(params, batch, self.config, prec)["score"]


def _bert_config() -> BertConfig:
    cfg = BertConfig.from_json_file(BERT_CONFIG_PATH)
    # test/debug hook: shrink the model without touching call sites, e.g.
    # KMR_CONFIG_OVERRIDES='{"hidden_size":32,"num_hidden_layers":2,...}'
    import json
    import os

    overrides = os.environ.get("KMR_CONFIG_OVERRIDES")
    if overrides:
        cfg = cfg.replace(**json.loads(overrides))
    return cfg


def get_model(name: str, overrides: dict | None = None) -> ModelSpec:
    """``overrides`` shrinks/reshapes one spec without touching the global
    env hook -- e.g. ``{"num_hidden_layers": 4}`` builds the 4-layer
    distilled student of a family while the 12-layer teacher coexists in
    the same process (train/distill.py). For LXMERT, ``l_layers`` /
    ``x_layers`` / ``r_layers`` target the stack depths; all other keys
    are BertConfig fields."""
    cfg = _bert_config()
    lxmert_overrides = {}
    if overrides:
        overrides = dict(overrides)
        for k in ("l_layers", "x_layers", "r_layers"):
            if k in overrides:
                lxmert_overrides[k] = overrides.pop(k)
        cfg = cfg.replace(**overrides)
    if name == "imagebert_a":
        return ModelSpec(
            name,
            cfg,
            init=lambda rng: imagebert_a.init_params(rng, cfg),
            apply=imagebert_a.apply,
            featurizer_layout="imagebert_a",
        )
    if name in ("imagebert_b", "imagebert_c"):
        return ModelSpec(
            name,
            cfg,
            init=lambda rng: imagebert_b.init_params(rng, cfg),
            apply=imagebert_b.apply,
            featurizer_layout="imagebert_b",
            sen2forest=(name == "imagebert_c"),
        )
    if name == "lxmert":
        lcfg = LxmertConfig(bert=cfg, **lxmert_overrides)
        return ModelSpec(
            name,
            lcfg,
            init=lambda rng: lxmert.init_params(rng, lcfg),
            apply=lxmert.apply,
            featurizer_layout="lxmert",
        )
    if name == "two_tower":
        # the retrieval stage the reference lacks (stretch capability):
        # dual encoder trained with in-batch InfoNCE, feeding the
        # recall -> cross-encoder cascade (scripts/cascade.py)
        from . import two_tower

        tcfg = two_tower.two_tower_config()
        return ModelSpec(
            name,
            tcfg,
            init=lambda rng: two_tower.init_params(rng, tcfg),
            apply=two_tower.apply,
            featurizer_layout="imagebert_b",
        )
    raise ValueError(f"unknown model {name!r}")


MODEL_NAMES = tuple(ENSEMBLE_WEIGHTS)
