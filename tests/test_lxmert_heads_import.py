"""LXMERT head importer vs real torch modules (KDDModel head schema).

The backbone import is validated against the reference LXRTModel in
test_lxmert_vs_torch; this covers the KDDModel-level heads: the
``logit_fc`` Sequential(Linear, GeLU, LayerNorm, Linear)
(``tasks/kdd_model.py:167-173``), ``cls`` BertPreTrainingHeads and
``logit_W``, including the ``lxrt_encoder.model.`` prefix stripping.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint.importers import (
    lxmert_from_torch,
    normalize_torch_keys,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
    BertConfig,
    LxmertConfig,
    Precision,
    heads,
)

HID = 32


class GeLU(torch.nn.Module):
    def forward(self, x):
        import math

        return x * 0.5 * (1.0 + torch.erf(x / math.sqrt(2.0)))


def test_logit_fc_import_and_forward_parity():
    torch.manual_seed(0)
    logit_fc = torch.nn.Sequential(
        torch.nn.Linear(HID, HID * 2),
        GeLU(),
        torch.nn.LayerNorm(HID * 2, eps=1e-12),
        torch.nn.Linear(HID * 2, 2),
    )
    sd = {f"logit_fc.{k}": v for k, v in logit_fc.state_dict().items()}
    sd["logit_W"] = torch.randn(HID, 2)
    # minimal backbone keys so the importer doesn't fail: none needed --
    # heads are parsed independently; emulate the KDDModel prefix on one key
    d = normalize_torch_keys({("module." + k): v.numpy() for k, v in sd.items()})
    assert "logit_fc.0.weight" in d

    params = {}
    params["logit_fc"] = {
        "fc1": {"kernel": d["logit_fc.0.weight"].T, "bias": d["logit_fc.0.bias"]},
        "LayerNorm": {"gamma": d["logit_fc.2.weight"], "beta": d["logit_fc.2.bias"]},
        "fc2": {"kernel": d["logit_fc.3.weight"].T, "bias": d["logit_fc.3.bias"]},
    }
    x = np.random.default_rng(0).standard_normal((4, HID)).astype(np.float32)
    with torch.no_grad():
        ref = logit_fc(torch.tensor(x)).numpy()
    got = np.asarray(
        heads.logit_fc(
            jax.tree.map(jnp.asarray, params["logit_fc"]), jnp.asarray(x), Precision.f32()
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_full_kddmodel_prefix_parsing():
    # emulate a KDDModel state_dict naming layout with tiny tensors
    lcfg = LxmertConfig(
        bert=BertConfig(vocab_size=11, hidden_size=8, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=9,
                        max_position_embeddings=16),
        l_layers=1, x_layers=1, r_layers=1, visual_feat_dim=6,
    )
    import numpy as np

    rng = np.random.default_rng(0)

    def lin(i, o):
        return {"weight": rng.standard_normal((o, i)).astype(np.float32),
                "bias": rng.standard_normal((o,)).astype(np.float32)}

    def ln(n):
        return {"weight": np.ones(n, np.float32), "bias": np.zeros(n, np.float32)}

    h = lcfg.bert.hidden_size
    sd = {}

    def put(base, tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                put(f"{base}.{k}", v)
            else:
                sd[f"{base}.{k}"] = v

    pre = "lxrt_encoder.model.bert"
    put(f"{pre}.embeddings.word_embeddings", {"weight": rng.standard_normal((11, h)).astype(np.float32)})
    put(f"{pre}.embeddings.position_embeddings", {"weight": rng.standard_normal((16, h)).astype(np.float32)})
    put(f"{pre}.embeddings.token_type_embeddings", {"weight": rng.standard_normal((2, h)).astype(np.float32)})
    put(f"{pre}.embeddings.LayerNorm", ln(h))
    for group, count in (("layer", 1), ("r_layers", 1)):
        for i in range(count):
            b = f"{pre}.encoder.{group}.{i}"
            put(f"{b}.attention.self.query", lin(h, h))
            put(f"{b}.attention.self.key", lin(h, h))
            put(f"{b}.attention.self.value", lin(h, h))
            put(f"{b}.attention.output.dense", lin(h, h))
            put(f"{b}.attention.output.LayerNorm", ln(h))
            put(f"{b}.intermediate.dense", lin(h, 9))
            put(f"{b}.output.dense", lin(9, h))
            put(f"{b}.output.LayerNorm", ln(h))
    b = f"{pre}.encoder.x_layers.0"
    put(f"{b}.visual_attention.att.query", lin(h, h))
    put(f"{b}.visual_attention.att.key", lin(h, h))
    put(f"{b}.visual_attention.att.value", lin(h, h))
    put(f"{b}.visual_attention.output.dense", lin(h, h))
    put(f"{b}.visual_attention.output.LayerNorm", ln(h))
    for side in ("lang", "visn"):
        put(f"{b}.{side}_self_att.self.query", lin(h, h))
        put(f"{b}.{side}_self_att.self.key", lin(h, h))
        put(f"{b}.{side}_self_att.self.value", lin(h, h))
        put(f"{b}.{side}_self_att.output.dense", lin(h, h))
        put(f"{b}.{side}_self_att.output.LayerNorm", ln(h))
        put(f"{b}.{side}_inter.dense", lin(h, 9))
        put(f"{b}.{side}_output.dense", lin(9, h))
        put(f"{b}.{side}_output.LayerNorm", ln(h))
    vf = f"{pre}.encoder.visn_fc"
    put(f"{vf}.visn_fc", lin(6, h))
    put(f"{vf}.visn_layer_norm", ln(h))
    put(f"{vf}.box_fc", lin(4, h))
    put(f"{vf}.box_layer_norm", ln(h))
    sd[f"{vf}.label_conv.weight"] = rng.standard_normal((1, 8, 1, 1)).astype(np.float32)
    sd[f"{vf}.label_conv.bias"] = rng.standard_normal((1,)).astype(np.float32)
    put(f"{vf}.label_fc", lin(h, h))
    put(f"{vf}.label_layer_norm", ln(h))
    put(f"{pre}.pooler.dense", lin(h, h))
    put("logit_fc.0", lin(h, 2 * h))
    put("logit_fc.2", ln(2 * h))
    put("logit_fc.3", lin(2 * h, 2))
    sd["logit_W"] = rng.standard_normal((h, 2)).astype(np.float32)
    put("cls.seq_relationship", lin(h, 2))
    put("cls.predictions.transform.dense", lin(h, h))
    put("cls.predictions.transform.LayerNorm", ln(h))
    sd["cls.predictions.bias"] = rng.standard_normal((11,)).astype(np.float32)

    params = lxmert_from_torch(sd, lcfg)
    assert params["logit_W"].shape == (h, 2)
    assert params["logit_fc"]["fc1"]["kernel"].shape == (h, 2 * h)
    assert params["cls"]["predictions"]["output_bias"].shape == (11,)
    assert params["bert"]["encoder"]["visn_fc"]["label_conv"]["weights"].shape == (8,)
    # kernels transposed from torch [out,in]
    np.testing.assert_array_equal(
        params["bert"]["pooler"]["dense"]["kernel"],
        sd["lxrt_encoder.model.bert.pooler.dense.weight"].T,
    )
