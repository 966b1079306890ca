"""Opt-in on-device regression tests (KMR_TPU_TESTS=1).

The CI suite forces the CPU backend (conftest), so the fused Pallas kernels
are only interpret-tested there. Set ``KMR_TPU_TESTS=1`` (and run where a
TPU is the default jax backend) to exercise the real Mosaic compilations:
every model, packed vs XLA backend, scores must agree to bf16 tolerance.
"""

import os

import numpy as np
import pytest

RUN = os.environ.get("KMR_TPU_TESTS") == "1"
pytestmark = pytest.mark.skipif(not RUN, reason="set KMR_TPU_TESTS=1 to run on device")

if RUN:  # force default platform (conftest pinned CPU otherwise)
    import jax

    jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "axon"))


def _model_batch(name, spec, B, rng):
    if name == "lxmert":
        nb = rng.integers(1, 11, (B,))
        nq = rng.integers(3, 24, (B,))
        v = spec.config.bert.vocab_size
        return {
            "input_ids": rng.integers(0, v, (B, 23)).astype(np.int32),
            "input_mask": (np.arange(23)[None] < nq[:, None]).astype(np.int32),
            "label_ids": rng.integers(0, v, (B, 10, 8)).astype(np.int32),
            "label_mask": np.ones((B, 10, 8), np.int32),
            "boxes": rng.standard_normal((B, 10, 4)).astype(np.float32),
            "features": rng.standard_normal((B, 10, 2048)).astype(np.float32),
            "feats_mask": (np.arange(10)[None] < nb[:, None]).astype(np.float32),
        }
    batch = {
        "input_ids": rng.integers(0, spec.config.vocab_size, (B, 20)).astype(np.int32),
        "segment_ids": (
            np.zeros((B, 20), np.int32)
            if name == "imagebert_a"
            else np.array([[0] * 20 + [1] * 10] * B, np.int32)
        ),
        "boxes": rng.standard_normal((B, 10, 5)).astype(np.float32),
        "features": rng.standard_normal((B, 10, 2048)).astype(np.float32),
        "label_ids": rng.integers(0, spec.config.vocab_size, (B, 10, 8)).astype(np.int32),
    }
    if name == "imagebert_b":
        batch["len_query"] = rng.integers(3, 21, (B,)).astype(np.int32)
        batch["num_boxes"] = rng.integers(1, 11, (B,)).astype(np.int32)
        batch["labels"] = np.ones((B,), np.int32)
    return batch


def _packed_vs_xla(name, env=()):
    import jax

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
        Precision,
        get_model,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops import attention

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    spec = get_model(name)
    params = jax.tree.map(
        lambda x: x.astype("bfloat16") if str(x.dtype) == "float32" else x,
        spec.init_params(jax.random.key(0)),
    )
    batch = jax.device_put(_model_batch(name, spec, 256, np.random.default_rng(0)))

    scores = {}
    for backend in ("xla", "pallas_packed"):
        with attention.attention_backend(backend):
            f = jax.jit(
                lambda p, b: spec.apply(p, b, spec.config, Precision.bf16())["score"]
            )
            scores[backend] = np.asarray(f(params, batch)).astype(np.float32)
    np.testing.assert_allclose(scores["pallas_packed"], scores["xla"], atol=2e-2)


@pytest.mark.parametrize("name", ["imagebert_a", "imagebert_b", "lxmert"])
def test_packed_backend_matches_xla_on_device(name):
    _packed_vs_xla(name)


@pytest.mark.parametrize(
    "name,env",
    [
        ("imagebert_a", ("KMR_FUSED_LAYER",)),
        ("lxmert", ("KMR_FUSED_LAYER",)),
        ("lxmert", ("KMR_DUAL_CROSS",)),
        ("lxmert", ("KMR_FUSED_LAYER", "KMR_DUAL_CROSS")),
    ],
)
def test_optin_fusion_matches_xla_on_device(name, env, monkeypatch):
    """The measured-negative fused-layer / dual-cross kernels stay opt-in
    (docs/BENCH.md round-3 fusion table); keep their model-level wiring
    correctness-covered on device."""
    for var in env:
        monkeypatch.setenv(var, "1")
    _packed_vs_xla(name, env)
