"""Slow numpy "spec" oracles: direct transcriptions of the reference graphs.

These are deliberately written in a different style from the JAX models --
per-layer/per-head python loops, literal TF-order operations -- so the fast
scan/vmap/Pallas paths can be regression-tested against an obviously-correct
rendering of the reference semantics (the reference itself ships no tests and
its checkpoints are not redistributable; see SURVEY.md section 4).

They consume the same parameter pytrees as the JAX models (stacked layer
axes are indexed per layer here).
"""

from __future__ import annotations

import numpy as np


def _np(tree):
    import jax

    # float64: the specs act as a high-precision oracle; the fast f32 path is
    # then expected to agree within f32 accumulation noise (~1e-4 on scores).
    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float64), tree)


def layer_norm(x, gamma, beta, eps=1e-12):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * gamma + beta


def gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def gelu_erf(x):
    from scipy.special import erf  # scipy ships with the baked-in stack

    return x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))


def softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _attention(lp, x, ctx, bias, num_heads):
    """BERT attention, per-head loop (pixelmodel.py:640-833)."""
    h = x.shape[-1]
    dh = h // num_heads
    q_all = x @ lp["query"]["kernel"] + lp["query"]["bias"]
    k_all = ctx @ lp["key"]["kernel"] + lp["key"]["bias"]
    v_all = ctx @ lp["value"]["kernel"] + lp["value"]["bias"]
    outs = []
    for n in range(num_heads):
        q = q_all[..., n * dh : (n + 1) * dh]
        k = k_all[..., n * dh : (n + 1) * dh]
        v = v_all[..., n * dh : (n + 1) * dh]
        scores = q @ k.transpose(0, 2, 1) / np.sqrt(dh)
        if bias is not None:
            scores = scores + bias
        outs.append(softmax(scores) @ v)
    o = np.concatenate(outs, axis=-1)
    o = o @ lp["output"]["dense"]["kernel"] + lp["output"]["dense"]["bias"]
    return layer_norm(
        o + x, lp["output"]["LayerNorm"]["gamma"], lp["output"]["LayerNorm"]["beta"]
    )


def _ffn(lp, x, act):
    h = act(x @ lp["intermediate"]["kernel"] + lp["intermediate"]["bias"])
    h = h @ lp["output"]["dense"]["kernel"] + lp["output"]["dense"]["bias"]
    return layer_norm(
        h + x, lp["output"]["LayerNorm"]["gamma"], lp["output"]["LayerNorm"]["beta"]
    )


def _encoder(stacked, x, bias, num_heads, act):
    n_layers = next(iter(_leaves(stacked))).shape[0]
    for i in range(n_layers):
        lp = _index(stacked, i)
        x = _attention(lp["attention"], x, x, bias, num_heads)
        x = _ffn(lp["ffn"], x, act)
    return x


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


def _index(tree, i):
    if isinstance(tree, dict):
        return {k: _index(v, i) for k, v in tree.items()}
    return tree[i]


def _pooler(pp, seq):
    return np.tanh(seq[:, 0, :] @ pp["dense"]["kernel"] + pp["dense"]["bias"])


# --------------------------------------------------------------------------
# ImageBERT-A
# --------------------------------------------------------------------------


def imagebert_a_score(params, batch, cfg) -> np.ndarray:
    p = _np(params)
    emb = p["bert"]["embeddings"]
    table = emb["word_embeddings"]

    # text block: word + type + position, LN (pixelmodel.py:196-232)
    text = table[batch["input_ids"]]
    text = text + emb["token_type_embeddings"][batch["segment_ids"]]
    text = text + emb["position_embeddings"][: text.shape[1]]
    text = layer_norm(text, emb["LayerNorm"]["gamma"], emb["LayerNorm"]["beta"])

    # feature block: plain FC (pixelmodel.py:439-442)
    feat = batch["features"] @ p["featureemb"]["kernel"] + p["featureemb"]["bias"]

    # label block: the reshape4D quirk, transcribed literally
    # (pixelmodel.py:489-498)
    e = table[batch["label_ids"]]  # [B,10,8,H]
    mix = emb["word_embeddings_labelembedding"]  # [8,1]
    flat = e.reshape(-1, 8)
    label = (flat @ mix).squeeze(-1).reshape(e.shape[0], e.shape[1], e.shape[3])

    x = np.concatenate([text, feat, label], axis=1)
    seq = _encoder(p["bert"]["encoder"], x, None, cfg.num_attention_heads, gelu_tanh)
    pooled = _pooler(p["bert"]["pooler"], seq)
    w = p["cls"]["seq_relationship"]["output_weights"]
    b = p["cls"]["seq_relationship"]["output_bias"]
    probs = softmax(pooled @ w.T + b)
    return probs[:, 1]


# --------------------------------------------------------------------------
# ImageBERT-B / C
# --------------------------------------------------------------------------


def imagebert_b_score(params, batch, cfg) -> np.ndarray:
    p = _np(params)
    emb = p["bert"]["embeddings"]
    table = emb["word_embeddings"]
    B = batch["input_ids"].shape[0]

    # label path: SAME-padded [1,8] conv + ReLU + mean (model_triple.py:189-190)
    le = table[batch["label_ids"]]  # [B,10,8,H]
    w1 = p["kdd_conv1"]["weights"]  # [8,Hin,Hout]
    b1 = p["kdd_conv1"]["biases"]
    padded = np.pad(le, ((0, 0), (0, 0), (3, 4), (0, 0)))
    conv = np.zeros(le.shape[:3] + (w1.shape[-1],), np.float64)
    for wpos in range(8):
        acc = np.zeros((B, le.shape[1], w1.shape[-1]), np.float64)
        for j in range(8):
            acc += padded[:, :, wpos + j, :] @ w1[j]
        conv[:, :, wpos, :] = acc
    conv = np.maximum(conv + b1, 0.0)
    label = conv.mean(axis=2)

    box = batch["boxes"] @ p["kdd_dense1"]["kernel"] + p["kdd_dense1"]["bias"]
    feat = np.maximum(
        batch["features"] @ p["kdd_conv2"]["kernel"] + p["kdd_conv2"]["bias"], 0.0
    )
    img = label + box + feat
    img = img @ p["kdd_featureemb"]["kernel"] + p["kdd_featureemb"]["bias"]

    text = table[batch["input_ids"]]
    x = np.concatenate([text, img], axis=1)
    x = x + emb["token_type_embeddings"][batch["segment_ids"]]
    pos_ids = list(range(20)) + [20] * 10
    x = x + emb["position_embeddings"][pos_ids]
    x = layer_norm(x, emb["LayerNorm"]["gamma"], emb["LayerNorm"]["beta"])

    qmask = (np.arange(20)[None] < batch["len_query"][:, None]).astype(np.float32)
    bmask = (np.arange(10)[None] < batch["num_boxes"][:, None]).astype(np.float32)
    mask = np.concatenate([qmask, bmask], axis=1)
    bias = ((1.0 - mask) * -10000.0)[:, None, :]

    seq = _encoder(p["bert"]["encoder"], x, bias, cfg.num_attention_heads, gelu_tanh)
    pooled = _pooler(p["bert"]["pooler"], seq)

    # AM-softmax scoring with fed label (model_triple.py:56-106)
    xn = pooled / np.maximum(np.linalg.norm(pooled, axis=1, keepdims=True), 1e-12)
    k = p["cls"]["seq_relationship"]["am_kernel"]
    kn = k / np.maximum(np.linalg.norm(k, axis=0, keepdims=True), 1e-10)
    cos = np.clip(xn @ kn, -1, 1)
    labels = batch["labels"]
    one_hot = np.eye(2, dtype=np.float32)[labels]
    gt = (cos * one_hot).sum(-1, keepdims=True)
    margin = np.where(gt > 0.35, 0.35, 0.0)
    logits = (cos - one_hot * margin) * 30.0
    return softmax(logits)[:, 1]


# --------------------------------------------------------------------------
# LXMERT
# --------------------------------------------------------------------------


def lxmert_score(params, batch, lcfg) -> np.ndarray:
    p = _np(params)
    cfg = lcfg.bert
    emb = p["bert"]["embeddings"]
    enc = p["bert"]["encoder"]

    def bert_embed(ids):
        x = emb["word_embeddings"][ids]
        x = x + emb["position_embeddings"][: ids.shape[-1]]
        x = x + emb["token_type_embeddings"][0]
        return layer_norm(x, emb["LayerNorm"]["gamma"], emb["LayerNorm"]["beta"])

    lang = bert_embed(batch["input_ids"])
    label_emb = bert_embed(batch["label_ids"])

    vf = enc["visn_fc"]
    x = batch["features"] @ vf["visn_fc"]["kernel"] + vf["visn_fc"]["bias"]
    x = layer_norm(x, vf["visn_layer_norm"]["gamma"], vf["visn_layer_norm"]["beta"])
    y = batch["boxes"] @ vf["box_fc"]["kernel"] + vf["box_fc"]["bias"]
    y = layer_norm(y, vf["box_layer_norm"]["gamma"], vf["box_layer_norm"]["beta"])
    z = np.einsum("bnth,t->bnh", label_emb, vf["label_conv"]["weights"])
    z = z + vf["label_conv"]["biases"]
    z = z @ vf["label_fc"]["kernel"] + vf["label_fc"]["bias"]
    z = layer_norm(z, vf["label_layer_norm"]["gamma"], vf["label_layer_norm"]["beta"])
    visn = (x + y + z) / 3.0

    lang_bias = ((1.0 - batch["input_mask"].astype(np.float32)) * -10000.0)[:, None, :]
    visn_bias = ((1.0 - batch["feats_mask"].astype(np.float32)) * -10000.0)[:, None, :]

    n = cfg.num_attention_heads
    for i in range(lcfg.l_layers):
        lp = _index(enc["layer"], i)
        lang = _attention(lp["attention"], lang, lang, lang_bias, n)
        lang = _ffn(lp["ffn"], lang, gelu_erf)
    for i in range(lcfg.r_layers):
        lp = _index(enc["r_layers"], i)
        visn = _attention(lp["attention"], visn, visn, visn_bias, n)
        visn = _ffn(lp["ffn"], visn, gelu_erf)
    for i in range(lcfg.x_layers):
        lp = _index(enc["x_layers"], i)
        l2 = _attention(lp["visual_attention"], lang, visn, visn_bias, n)
        v2 = _attention(lp["visual_attention"], visn, lang, lang_bias, n)
        l3 = _attention(lp["lang_self_att"], l2, l2, lang_bias, n)
        v3 = _attention(lp["visn_self_att"], v2, v2, visn_bias, n)
        lang = _ffn(lp["lang_ffn"], l3, gelu_erf)
        visn = _ffn(lp["visn_ffn"], v3, gelu_erf)

    pooled = _pooler(p["bert"]["pooler"], lang)
    fc = p["logit_fc"]
    h = gelu_erf(pooled @ fc["fc1"]["kernel"] + fc["fc1"]["bias"])
    h = layer_norm(h, fc["LayerNorm"]["gamma"], fc["LayerNorm"]["beta"])
    logit = h @ fc["fc2"]["kernel"] + fc["fc2"]["bias"]
    return softmax(logit)[:, -1]
