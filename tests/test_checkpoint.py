"""Checkpoint importer/IO tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import (
    flatten_tree,
    imagebert_a_from_tf,
    imagebert_b_from_tf,
    load_npz,
    restore_pytree,
    save_npz,
    save_pytree,
    unflatten_tree,
    read_torch_state_dict,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
    BertConfig,
    imagebert_a,
    imagebert_b,
)

TINY = BertConfig(
    vocab_size=61,
    hidden_size=16,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=23,
    max_position_embeddings=32,
)


def _export_tf_names_a(params) -> dict:
    """Inverse of imagebert_a_from_tf for test fixtures."""
    flat = {}
    emb = params["bert"]["embeddings"]
    for k in ("word_embeddings", "token_type_embeddings", "position_embeddings",
              "word_embeddings_labelembedding"):
        flat[f"bert/embeddings/{k}"] = np.asarray(emb[k])
    flat["bert/embeddings/LayerNorm/gamma"] = np.asarray(emb["LayerNorm"]["gamma"])
    flat["bert/embeddings/LayerNorm/beta"] = np.asarray(emb["LayerNorm"]["beta"])
    enc = params["bert"]["encoder"]
    n_layers = np.asarray(jax.tree.leaves(enc)[0]).shape[0]
    for i in range(n_layers):
        lp = f"bert/encoder/layer_{i}"
        att = enc["attention"]
        for nm in ("query", "key", "value"):
            flat[f"{lp}/attention/self/{nm}/kernel"] = np.asarray(att[nm]["kernel"][i])
            flat[f"{lp}/attention/self/{nm}/bias"] = np.asarray(att[nm]["bias"][i])
        flat[f"{lp}/attention/output/dense/kernel"] = np.asarray(att["output"]["dense"]["kernel"][i])
        flat[f"{lp}/attention/output/dense/bias"] = np.asarray(att["output"]["dense"]["bias"][i])
        flat[f"{lp}/attention/output/LayerNorm/gamma"] = np.asarray(att["output"]["LayerNorm"]["gamma"][i])
        flat[f"{lp}/attention/output/LayerNorm/beta"] = np.asarray(att["output"]["LayerNorm"]["beta"][i])
        ffn = enc["ffn"]
        flat[f"{lp}/intermediate/dense/kernel"] = np.asarray(ffn["intermediate"]["kernel"][i])
        flat[f"{lp}/intermediate/dense/bias"] = np.asarray(ffn["intermediate"]["bias"][i])
        flat[f"{lp}/output/dense/kernel"] = np.asarray(ffn["output"]["dense"]["kernel"][i])
        flat[f"{lp}/output/dense/bias"] = np.asarray(ffn["output"]["dense"]["bias"][i])
        flat[f"{lp}/output/LayerNorm/gamma"] = np.asarray(ffn["output"]["LayerNorm"]["gamma"][i])
        flat[f"{lp}/output/LayerNorm/beta"] = np.asarray(ffn["output"]["LayerNorm"]["beta"][i])
    flat["bert/pooler/dense/kernel"] = np.asarray(params["bert"]["pooler"]["dense"]["kernel"])
    flat["bert/pooler/dense/bias"] = np.asarray(params["bert"]["pooler"]["dense"]["bias"])
    flat["featureemb/fully_connected/weights"] = np.asarray(params["featureemb"]["kernel"])
    flat["featureemb/fully_connected/biases"] = np.asarray(params["featureemb"]["bias"])
    sr = params["cls"]["seq_relationship"]
    flat["cls/seq_relationship/output_weights"] = np.asarray(sr["output_weights"])
    flat["cls/seq_relationship/output_bias"] = np.asarray(sr["output_bias"])
    pred = params["cls"]["predictions"]
    flat["cls/predictions/transform/dense/kernel"] = np.asarray(pred["transform"]["dense"]["kernel"])
    flat["cls/predictions/transform/dense/bias"] = np.asarray(pred["transform"]["dense"]["bias"])
    flat["cls/predictions/transform/LayerNorm/gamma"] = np.asarray(pred["transform"]["LayerNorm"]["gamma"])
    flat["cls/predictions/transform/LayerNorm/beta"] = np.asarray(pred["transform"]["LayerNorm"]["beta"])
    flat["cls/predictions/output_bias"] = np.asarray(pred["output_bias"])
    return flat


def _trees_equal(a, b):
    fa, fb = flatten_tree(a), flatten_tree(b)
    assert set(fa) == set(fb), set(fa) ^ set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], np.asarray(fb[k]), err_msg=k)


def test_imagebert_a_tf_roundtrip():
    params = imagebert_a.init_params(jax.random.key(0), TINY)
    flat = _export_tf_names_a(params)
    imported = imagebert_a_from_tf(flat, TINY)
    _trees_equal(imported, params)


def test_imagebert_b_ema_prefers_shadows():
    params = imagebert_b.init_params(jax.random.key(1), TINY)
    # build a var dict where every trainable also has an EMA shadow = var + 1
    from tests.test_checkpoint import _export_tf_names_b  # self-import ok

    flat = _export_tf_names_b(params)
    shadows = {k + "/ExponentialMovingAverage": v + 1.0 for k, v in flat.items()}
    merged = {**flat, **shadows}
    imported = imagebert_b_from_tf(merged, TINY, ema=True)
    base = imagebert_b_from_tf(flat, TINY, ema=False)
    fa, fb = flatten_tree(imported), flatten_tree(base)
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k] + 1.0, err_msg=k)


def _export_tf_names_b(params) -> dict:
    flat = {}
    emb = params["bert"]["embeddings"]
    for k in ("word_embeddings", "token_type_embeddings", "position_embeddings"):
        flat[f"bert/embeddings/{k}"] = np.asarray(emb[k])
    flat["bert/embeddings/LayerNorm/gamma"] = np.asarray(emb["LayerNorm"]["gamma"])
    flat["bert/embeddings/LayerNorm/beta"] = np.asarray(emb["LayerNorm"]["beta"])
    enc = params["bert"]["encoder"]
    n_layers = np.asarray(jax.tree.leaves(enc)[0]).shape[0]
    for i in range(n_layers):
        lp = f"bert/encoder/layer_{i}"
        att = enc["attention"]
        for nm in ("query", "key", "value"):
            flat[f"{lp}/attention/self/{nm}/kernel"] = np.asarray(att[nm]["kernel"][i])
            flat[f"{lp}/attention/self/{nm}/bias"] = np.asarray(att[nm]["bias"][i])
        flat[f"{lp}/attention/output/dense/kernel"] = np.asarray(att["output"]["dense"]["kernel"][i])
        flat[f"{lp}/attention/output/dense/bias"] = np.asarray(att["output"]["dense"]["bias"][i])
        flat[f"{lp}/attention/output/LayerNorm/gamma"] = np.asarray(att["output"]["LayerNorm"]["gamma"][i])
        flat[f"{lp}/attention/output/LayerNorm/beta"] = np.asarray(att["output"]["LayerNorm"]["beta"][i])
        ffn = enc["ffn"]
        flat[f"{lp}/intermediate/dense/kernel"] = np.asarray(ffn["intermediate"]["kernel"][i])
        flat[f"{lp}/intermediate/dense/bias"] = np.asarray(ffn["intermediate"]["bias"][i])
        flat[f"{lp}/output/dense/kernel"] = np.asarray(ffn["output"]["dense"]["kernel"][i])
        flat[f"{lp}/output/dense/bias"] = np.asarray(ffn["output"]["dense"]["bias"][i])
        flat[f"{lp}/output/LayerNorm/gamma"] = np.asarray(ffn["output"]["LayerNorm"]["gamma"][i])
        flat[f"{lp}/output/LayerNorm/beta"] = np.asarray(ffn["output"]["LayerNorm"]["beta"][i])
    flat["bert/pooler/dense/kernel"] = np.asarray(params["bert"]["pooler"]["dense"]["kernel"])
    flat["bert/pooler/dense/bias"] = np.asarray(params["bert"]["pooler"]["dense"]["bias"])
    flat["kdd_featureemb/fully_connected/weights"] = np.asarray(params["kdd_featureemb"]["kernel"])
    flat["kdd_featureemb/fully_connected/biases"] = np.asarray(params["kdd_featureemb"]["bias"])
    flat["kdd_conv1/weights"] = np.asarray(params["kdd_conv1"]["weights"])[None]  # [1,8,H,H]
    flat["kdd_conv1/biases"] = np.asarray(params["kdd_conv1"]["biases"])
    flat["kdd_dense1/weights"] = np.asarray(params["kdd_dense1"]["kernel"])
    flat["kdd_dense1/biases"] = np.asarray(params["kdd_dense1"]["bias"])
    flat["kdd_conv2/weights"] = np.asarray(params["kdd_conv2"]["kernel"])[None, None]
    flat["kdd_conv2/biases"] = np.asarray(params["kdd_conv2"]["bias"])
    flat["cls/seq_relationship/am_kernel"] = np.asarray(
        params["cls"]["seq_relationship"]["am_kernel"]
    )
    return flat


def test_imagebert_b_tf_roundtrip_conv_reshapes():
    params = imagebert_b.init_params(jax.random.key(2), TINY)
    flat = _export_tf_names_b(params)
    imported = imagebert_b_from_tf(flat, TINY, ema=False)
    np.testing.assert_array_equal(
        imported["kdd_conv1"]["weights"], np.asarray(params["kdd_conv1"]["weights"])
    )
    np.testing.assert_array_equal(
        imported["kdd_conv2"]["kernel"], np.asarray(params["kdd_conv2"]["kernel"])
    )
    _trees_equal(imported, params)


def test_npz_roundtrip(tmp_path):
    tree = {"a": {"b": np.arange(6).reshape(2, 3)}, "c": np.float32(1.5)}
    p = tmp_path / "t.npz"
    save_npz(p, tree)
    back = load_npz(p)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    assert float(back["c"]) == 1.5


def test_orbax_roundtrip(tmp_path):
    tree = {"x": np.arange(4, dtype=np.float32), "n": {"y": np.ones((2, 2))}}
    path = tmp_path / "ckpt"
    save_pytree(path, tree)
    back = restore_pytree(path)
    np.testing.assert_array_equal(np.asarray(back["x"]), tree["x"])
    np.testing.assert_array_equal(np.asarray(back["n"]["y"]), tree["n"]["y"])


def test_torch_state_dict_reader(tmp_path):
    torch = pytest.importorskip("torch")
    m = torch.nn.Linear(4, 3)
    p = tmp_path / "m.pth"
    torch.save(m.state_dict(), p)
    sd = read_torch_state_dict(p)
    assert set(sd) == {"weight", "bias"}
    assert sd["weight"].shape == (3, 4)
