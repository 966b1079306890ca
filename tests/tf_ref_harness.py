"""Execute the *actual* reference TF1 model files under TF2's compat.v1.

The reference graphs (``imagebert_lds/src/pixelmodel.py``,
``imagebert_zk/{pixelbert,model_triple}.py``) are TF1-era and use
``tf.contrib`` (slim layers + contrib layer_norm), which no longer ships
with TF2. This harness provides a faithful ~100-line contrib shim
(semantics of tensorflow/contrib/layers: layer_norm eps 1e-12,
slim.fully_connected with ``weights``/``biases`` variables, slim.conv2d
NHWC SAME + relu default) and imports the untouched reference sources with
``sys.modules['tensorflow']`` pointed at a compat.v1 proxy.

This upgrades ImageBERT-A/B parity evidence from "matches our own numpy
transcription" to "matches the reference artifact executed by TF itself".
"""

from __future__ import annotations

import contextlib
import importlib.util
import os
import sys
import types


def _make_contrib(tf1):
    """Build a module tree mimicking tensorflow.contrib (only what the
    reference model files touch)."""

    def layer_norm(
        inputs,
        center=True,
        scale=True,
        activation_fn=None,
        reuse=None,
        variables_collections=None,
        outputs_collections=None,
        trainable=True,
        begin_norm_axis=1,
        begin_params_axis=-1,
        scope=None,
    ):
        # contrib.layers.layer_norm: params over [begin_params_axis:], norm
        # over [begin_norm_axis:], batch_normalization with eps 1e-12
        with tf1.variable_scope(scope, "LayerNorm", [inputs], reuse=reuse):
            shape = inputs.shape
            ndims = shape.ndims
            params_shape = shape[begin_params_axis:]
            beta = (
                tf1.get_variable(
                    "beta", shape=params_shape, initializer=tf1.zeros_initializer(),
                    trainable=trainable,
                )
                if center
                else None
            )
            gamma = (
                tf1.get_variable(
                    "gamma", shape=params_shape, initializer=tf1.ones_initializer(),
                    trainable=trainable,
                )
                if scale
                else None
            )
            axis = begin_norm_axis if begin_norm_axis >= 0 else ndims + begin_norm_axis
            mean, variance = tf1.nn.moments(inputs, list(range(axis, ndims)), keep_dims=True)
            out = tf1.nn.batch_normalization(
                inputs, mean, variance, offset=beta, scale=gamma, variance_epsilon=1e-12
            )
            if activation_fn is not None:
                out = activation_fn(out)
            return out

    def fully_connected(
        inputs,
        num_outputs,
        activation_fn=tf1.nn.relu,
        normalizer_fn=None,
        normalizer_params=None,
        weights_initializer=None,
        weights_regularizer=None,
        biases_initializer=None,
        biases_regularizer=None,
        reuse=None,
        variables_collections=None,
        outputs_collections=None,
        trainable=True,
        scope=None,
    ):
        with tf1.variable_scope(scope, "fully_connected", [inputs], reuse=reuse):
            w = tf1.get_variable(
                "weights",
                [int(inputs.shape[-1]), num_outputs],
                initializer=weights_initializer or tf1.glorot_uniform_initializer(),
                trainable=trainable,
            )
            y = tf1.tensordot(inputs, w, [[inputs.shape.ndims - 1], [0]])
            b = tf1.get_variable(
                "biases",
                [num_outputs],
                initializer=biases_initializer or tf1.zeros_initializer(),
                trainable=trainable,
            )
            y = tf1.nn.bias_add(y, b)
            if activation_fn is not None:
                y = activation_fn(y)
            return y

    def conv2d(
        inputs,
        num_outputs,
        kernel_size,
        stride=1,
        padding="SAME",
        data_format=None,
        rate=1,
        activation_fn=tf1.nn.relu,
        normalizer_fn=None,
        normalizer_params=None,
        weights_initializer=None,
        weights_regularizer=None,
        biases_initializer=None,
        biases_regularizer=None,
        reuse=None,
        variables_collections=None,
        outputs_collections=None,
        trainable=True,
        scope=None,
    ):
        with tf1.variable_scope(scope, "Conv", [inputs], reuse=reuse):
            kh, kw = kernel_size
            w = tf1.get_variable(
                "weights",
                [kh, kw, int(inputs.shape[-1]), num_outputs],
                initializer=weights_initializer or tf1.glorot_uniform_initializer(),
                trainable=trainable,
            )
            y = tf1.nn.conv2d(inputs, w, strides=[1, stride, stride, 1], padding=padding)
            b = tf1.get_variable(
                "biases", [num_outputs], initializer=biases_initializer or tf1.zeros_initializer(),
                trainable=trainable,
            )
            y = tf1.nn.bias_add(y, b)
            if activation_fn is not None:
                y = activation_fn(y)
            return y

    @contextlib.contextmanager
    def arg_scope(list_ops_or_scope, **kwargs):
        # the reference only arg-scopes batch_norm/dropout, neither of which
        # is on the executed paths; a no-op preserves semantics
        yield {}

    def xavier_initializer(uniform=True, seed=None, dtype=None):
        return tf1.glorot_uniform_initializer(seed) if uniform else tf1.glorot_normal_initializer(seed)

    def _unused(*a, **k):  # slim.batch_norm / slim.dropout: arg_scope keys only
        raise NotImplementedError("not exercised by the reference inference paths")

    layers = types.ModuleType("tensorflow.contrib.layers")
    layers.layer_norm = layer_norm
    layers.fully_connected = fully_connected
    layers.conv2d = conv2d
    layers.xavier_initializer = xavier_initializer

    nets = types.ModuleType("tensorflow.contrib.slim.nets")
    nets.resnet_v1 = types.ModuleType("resnet_v1")  # imported, never used

    slim = types.ModuleType("tensorflow.contrib.slim")
    slim.conv2d = conv2d
    slim.fully_connected = fully_connected
    slim.arg_scope = arg_scope
    slim.batch_norm = _unused
    slim.dropout = _unused
    slim.nets = nets

    rnn = types.ModuleType("tensorflow.contrib.rnn")

    contrib = types.ModuleType("tensorflow.contrib")
    contrib.layers = layers
    contrib.slim = slim
    contrib.rnn = rnn
    return contrib


def _make_tf_layers(tf1):
    """Shim for the legacy ``tf.layers`` namespace (removed with Keras 3).

    Variable naming matches legacy tf.layers: scope ``name`` (default
    'dense', uniquified within the enclosing scope), variables
    ``kernel``/``bias`` -- the schema BERT checkpoints use."""

    def dense(
        inputs,
        units,
        activation=None,
        use_bias=True,
        kernel_initializer=None,
        bias_initializer=None,
        name=None,
        reuse=None,
        **_,
    ):
        with tf1.variable_scope(name, "dense", [inputs], reuse=reuse):
            kernel = tf1.get_variable(
                "kernel",
                [int(inputs.shape[-1]), units],
                initializer=kernel_initializer or tf1.glorot_uniform_initializer(),
            )
            y = tf1.tensordot(inputs, kernel, [[inputs.shape.ndims - 1], [0]])
            if use_bias:
                bias = tf1.get_variable(
                    "bias", [units], initializer=bias_initializer or tf1.zeros_initializer()
                )
                y = tf1.nn.bias_add(y, bias)
            if activation is not None:
                y = activation(y)
            return y

    def dropout(inputs, rate=0.5, training=False, name=None, **_):
        if training is False or training is None or rate == 0.0:
            return tf1.identity(inputs, name=name)
        return tf1.nn.dropout(inputs, rate=rate, name=name)

    layers = types.ModuleType("tensorflow.layers")
    layers.dense = dense
    layers.dropout = dropout
    return layers


class _TF1Proxy(types.ModuleType):
    """`import tensorflow as tf` resolves to this: compat.v1 + contrib."""

    def __init__(self, tf1, contrib):
        super().__init__("tensorflow")
        self.contrib = contrib
        self.layers = _make_tf_layers(tf1)
        self.__dict__["_tf1"] = tf1

    def __getattr__(self, name):
        return getattr(self._tf1, name)


@contextlib.contextmanager
def reference_tf_modules(*file_specs, cwd=None):
    """Import untouched reference TF1 sources; yields {alias: module}.

    file_specs: (alias, path) pairs, loaded in order (so ``pixelbert`` can
    be registered before ``model_triple`` imports it). ``cwd`` is chdir'd
    during exec for modules that read relative paths at import time
    (``model_triple.py:19`` reads ``../user_data/bert_config.json``).
    """
    import tensorflow.compat.v1 as tf1

    tf1.disable_eager_execution()
    contrib = _make_contrib(tf1)
    proxy = _TF1Proxy(tf1, contrib)
    patch = {
        "tensorflow": proxy,
        "tensorflow.contrib": contrib,
        "tensorflow.contrib.layers": contrib.layers,
        "tensorflow.contrib.slim": contrib.slim,
        "tensorflow.contrib.slim.nets": contrib.slim.nets,
        "tensorflow.contrib.rnn": contrib.rnn,
    }
    saved = {k: sys.modules.get(k) for k in patch}
    sys.modules.update(patch)
    olddir = os.getcwd()
    loaded = []
    try:
        if cwd is not None:
            os.chdir(cwd)
        mods = {}
        for alias, path in file_specs:
            spec = importlib.util.spec_from_file_location(alias, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[alias] = mod
            loaded.append(alias)
            spec.loader.exec_module(mod)
            mods[alias] = mod
        os.chdir(olddir)
        yield mods
    finally:
        os.chdir(olddir)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for alias in loaded:
            sys.modules.pop(alias, None)


def run_graph(graph, fetches, feed_dict):
    """Initialise variables, run fetches, and return (values, var_dict).

    var_dict maps ``op.name`` (no ``:0``) -> np.ndarray for every global
    variable -- the flat schema our checkpoint importers consume.
    """
    import tensorflow.compat.v1 as tf1

    with tf1.Session(graph=graph) as sess:
        sess.run(tf1.global_variables_initializer())
        variables = tf1.global_variables()
        values = sess.run(list(fetches), feed_dict=feed_dict)
        var_vals = sess.run({v.op.name: v for v in variables})
    return values, var_vals
