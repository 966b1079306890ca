"""Cross-check ImageBERT-A and B against the ACTUAL reference TF graphs.

The reference TF1 model files are executed untouched (via
``tf_ref_harness``'s contrib shim) at a reduced-depth config, every TF
variable is exported, imported through our checkpoint importers, and the
JAX forward is asserted to agree with the TF session's scores.

Hidden size stays 768: the reference hard-codes it in the image paths
(``pixelmodel.py:439-442`` feature_embedding outshape=768;
``model_triple.py:189-193`` conv widths; ``model_triple.py:62-63``
am_kernel [768, 2]), so a narrower test config cannot execute.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
tf = pytest.importorskip("tensorflow")

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint.importers import (
    imagebert_a_from_tf,
    imagebert_b_from_tf,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import Precision
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
    imagebert_a as jax_a,
    imagebert_b as jax_b,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.core import BertConfig

from tf_ref_harness import reference_tf_modules, run_graph

B = 3
CFG = dict(
    vocab_size=130,
    hidden_size=768,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=96,
    hidden_act="gelu",
    hidden_dropout_prob=0.1,  # zeroed at inference by both sides
    attention_probs_dropout_prob=0.1,
    max_position_embeddings=64,
    type_vocab_size=2,
    initializer_range=0.02,
)


# the shipped production shape (assets/user_data/bert_config.json): the
# full-depth cross-checks exercise scan-stack accumulation over all 12
# layers, which depth-2 parity cannot (round-3 verdict item 4)
FULL_CFG = dict(
    vocab_size=21128,
    hidden_size=768,
    num_hidden_layers=12,
    num_attention_heads=12,
    intermediate_size=3072,
    hidden_act="gelu",
    hidden_dropout_prob=0.1,
    attention_probs_dropout_prob=0.1,
    max_position_embeddings=512,
    type_vocab_size=2,
    initializer_range=0.02,
)

slow = pytest.mark.skipif(
    not os.environ.get("KMR_SLOW_TESTS"),
    reason="full-depth (12x768) TF cross-check; set KMR_SLOW_TESTS=1",
)


def _jax_cfg(cfg=None) -> BertConfig:
    return BertConfig(**(cfg or CFG))


def _run_a_parity(reference_dir, cfg_dict):
    """pixelmodel.BertModel + NSP head (run_pretraining_evaluate.py:479-501)
    vs models/imagebert_a.py, same random weights, tol 1e-4."""
    src = reference_dir / "code/imagebert_lds/src/pixelmodel.py"
    rng = np.random.default_rng(7)
    input_ids = rng.integers(0, cfg_dict["vocab_size"], (B, 20)).astype(np.int32)
    segment_ids = (rng.random((B, 20)) < 0.3).astype(np.int32)
    features = rng.standard_normal((B, 10, 2048)).astype(np.float32)
    label_ids = rng.integers(0, cfg_dict["vocab_size"], (B, 10, 8)).astype(np.int32)

    with reference_tf_modules(("ref_pixelmodel", str(src))) as mods:
        pm = mods["ref_pixelmodel"]
        import tensorflow.compat.v1 as tf1

        graph = tf1.Graph()
        with graph.as_default():
            cfg_tf = pm.BertConfig(**cfg_dict)
            ids_ph = tf1.placeholder(tf1.int32, [B, 20])
            seg_ph = tf1.placeholder(tf1.int32, [B, 20])
            feat_ph = tf1.placeholder(tf1.float32, [B, 10, 2048])
            lab_ph = tf1.placeholder(tf1.int32, [B, 10, 8])
            model = pm.BertModel(
                imgfeat=feat_ph,
                config=cfg_tf,
                is_training=False,
                input_ids=ids_ph,
                label_ids=lab_ph,
                token_type_ids=seg_ph,
            )
            # NSP scoring head, exactly run_pretraining_evaluate.py:479-501
            with tf1.variable_scope("cls/seq_relationship"):
                w = tf1.get_variable(
                    "output_weights", [2, cfg_dict["hidden_size"]],
                    initializer=pm.create_initializer(cfg_dict["initializer_range"]),
                )
                b = tf1.get_variable("output_bias", [2], initializer=tf1.zeros_initializer())
                logits = tf1.nn.bias_add(tf1.matmul(model.get_pooled_output(), w, transpose_b=True), b)
                probs = tf1.nn.softmax(logits, axis=-1)
        (tf_probs,), tf_vars = run_graph(
            graph,
            [probs],
            {ids_ph: input_ids, seg_ph: segment_ids, feat_ph: features, lab_ph: label_ids},
        )

    cfg = _jax_cfg(cfg_dict)
    params = imagebert_a_from_tf(tf_vars, cfg)
    batch = {
        "input_ids": input_ids,
        "segment_ids": segment_ids,
        "features": features,
        "label_ids": label_ids,
    }
    out = jax_a.apply(jax.tree.map(np.asarray, params), batch, cfg, Precision.f32())
    np.testing.assert_allclose(np.asarray(out["probs"]), tf_probs, atol=1e-4, rtol=1e-4)


def test_imagebert_a_matches_reference_tf_graph(reference_dir):
    _run_a_parity(reference_dir, CFG)


@slow
def test_imagebert_a_full_depth_matches_reference_tf_graph(reference_dir):
    """All 12 layers at the shipped 768/3072 config: catches scan-stack
    accumulation drift that depth-2 parity cannot
    (pixelmodel.py:121-304 at production shape)."""
    _run_a_parity(reference_dir, FULL_CFG)


def _build_ref_b_graph(reference_dir, tmp_path, cfg_dict=None):
    """Build model_attention_channel_e's graph from the untouched reference
    sources. -> (graph, probs_tensor, feed_dict, batch_for_jax)."""
    cfg_dict = cfg_dict or CFG
    zk = reference_dir / "code/imagebert_zk"
    # model_triple.py:19 reads ../user_data/bert_config.json at import time
    (tmp_path / "user_data").mkdir()
    (tmp_path / "user_data/bert_config.json").write_text(json.dumps(cfg_dict))
    code_dir = tmp_path / "code"
    code_dir.mkdir()

    rng = np.random.default_rng(11)
    input_ids = rng.integers(0, cfg_dict["vocab_size"], (B, 20)).astype(np.int32)
    segment_ids = np.concatenate(
        [np.zeros((B, 20), np.int32), np.ones((B, 10), np.int32)], axis=1
    )
    boxes = rng.standard_normal((B, 10, 5)).astype(np.float32)
    features = rng.standard_normal((B, 10, 2048)).astype(np.float32)
    label_ids = rng.integers(0, cfg_dict["vocab_size"], (B, 10, 8)).astype(np.int32)
    len_query = rng.integers(3, 21, (B,)).astype(np.int32)
    num_boxes = rng.integers(1, 11, (B,)).astype(np.int32)
    labels = rng.integers(0, 2, (B,)).astype(np.int32)

    with reference_tf_modules(
        ("pixelbert", str(zk / "pixelbert.py")),
        ("ref_model_triple", str(zk / "model_triple.py")),
        cwd=str(code_dir),
    ) as mods:
        mt = mods["ref_model_triple"]
        import tensorflow.compat.v1 as tf1

        graph = tf1.Graph()
        with graph.as_default():
            nb_ph = tf1.placeholder(tf1.int32, [B])
            box_ph = tf1.placeholder(tf1.float32, [B, 10, 5])
            feat_ph = tf1.placeholder(tf1.float32, [B, 10, 2048])
            lab_ph = tf1.placeholder(tf1.int32, [B, 10, 8])
            ids_ph = tf1.placeholder(tf1.int32, [B, 20])
            lq_ph = tf1.placeholder(tf1.int32, [B])
            y_ph = tf1.placeholder(tf1.int32, [B])
            seg_ph = tf1.placeholder(tf1.int32, [B, 30])
            _, probs, _ = mt.model_attention_channel_e(
                nb_ph, box_ph, feat_ph, lab_ph, None, ids_ph, lq_ph, y_ph, seg_ph,
                None, None, is_training=False,
            )
        feed = {
            nb_ph: num_boxes,
            box_ph: boxes,
            feat_ph: features,
            lab_ph: label_ids,
            ids_ph: input_ids,
            lq_ph: len_query,
            y_ph: labels,
            seg_ph: segment_ids,
        }
    batch = {
        "input_ids": input_ids,
        "segment_ids": segment_ids,
        "boxes": boxes,
        "features": features,
        "label_ids": label_ids,
        "len_query": len_query,
        "num_boxes": num_boxes,
        "labels": labels,
    }
    return graph, probs, feed, batch


def _jax_b_probs(tf_vars, batch, ema: bool, cfg_dict=None) -> np.ndarray:
    cfg = _jax_cfg(cfg_dict)
    params = imagebert_b_from_tf(tf_vars, cfg, ema=ema)
    out = jax_b.apply(jax.tree.map(np.asarray, params), batch, cfg, Precision.f32())
    return np.asarray(out["probs"])


def test_imagebert_b_matches_reference_tf_graph(reference_dir, tmp_path):
    """model_triple.model_attention_channel_e (image path + pixelbert 30-tok
    BertModel + AM head) vs models/imagebert_b.py, same weights, tol 1e-4."""
    graph, probs, feed, batch = _build_ref_b_graph(reference_dir, tmp_path)
    (tf_probs,), tf_vars = run_graph(graph, [probs], feed)
    np.testing.assert_allclose(_jax_b_probs(tf_vars, batch, ema=False), tf_probs, atol=1e-4, rtol=1e-4)


@slow
def test_imagebert_b_full_depth_matches_reference_tf_graph(reference_dir, tmp_path):
    """All 12 layers at the shipped 768/3072 config
    (pixelbert.py:126-312 at production shape)."""
    graph, probs, feed, batch = _build_ref_b_graph(
        reference_dir, tmp_path, FULL_CFG
    )
    (tf_probs,), tf_vars = run_graph(graph, [probs], feed)
    np.testing.assert_allclose(
        _jax_b_probs(tf_vars, batch, ema=False, cfg_dict=FULL_CFG),
        tf_probs, atol=1e-4, rtol=1e-4,
    )


def test_tf_bundle_reads_real_saver_checkpoint_with_ema(reference_dir, tmp_path):
    """Write a REAL tf.compat.v1.train.Saver checkpoint of the reference B
    graph (incl. ``<name>/ExponentialMovingAverage`` shadows, as
    evaluate_normal.py:204-212 restores), then assert:

    1. the pure-python tensor_bundle reader matches TF's own reader
       bit-for-bit on every tensor,
    2. ``imagebert_b_from_tf(ema=True)`` from the checkpoint reproduces the
       session's scores even after the raw variables are perturbed,
    3. ``ema=False`` picks the perturbed raw weights instead (scores move).
    """
    import tensorflow.compat.v1 as tf1

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint.tf_bundle import (
        _read_pure_python,
        _read_with_tensorflow,
    )

    graph, probs, feed, batch = _build_ref_b_graph(reference_dir, tmp_path)
    with graph.as_default():
        ema = tf1.train.ExponentialMovingAverage(0.997)
        ema_op = ema.apply(tf1.trainable_variables())
        perturb = [v.assign(v + 0.05) for v in tf1.trainable_variables()]
        saver = tf1.train.Saver(tf1.global_variables())
    prefix = str(tmp_path / "ckpt" / "model.ckpt-251")
    with tf1.Session(graph=graph) as sess:
        sess.run(tf1.global_variables_initializer())
        tf_probs = sess.run(probs, feed_dict=feed)
        sess.run(ema_op)  # shadows snapshot the scoring weights
        sess.run(perturb)  # raw vars drift away, shadows keep the snapshot
        saver.save(sess, prefix)

    pure = _read_pure_python(prefix)
    via_tf = _read_with_tensorflow(prefix)
    assert sorted(pure) == sorted(via_tf)
    assert any(k.endswith("/ExponentialMovingAverage") for k in pure)
    for name in via_tf:
        np.testing.assert_array_equal(pure[name], via_tf[name], err_msg=name)

    np.testing.assert_allclose(_jax_b_probs(pure, batch, ema=True), tf_probs, atol=1e-4, rtol=1e-4)
    raw_probs = _jax_b_probs(pure, batch, ema=False)
    assert not np.allclose(raw_probs, tf_probs, atol=1e-3)
