"""Activations with the exact variants the reference checkpoints were trained on.

* ImageBERT-A/B/C use the tanh-approximated GELU
  (``pixelmodel.py:307-320``): 0.5*x*(1+tanh(sqrt(2/pi)*(x+0.044715*x^3))).
* LXMERT uses the erf GELU (``lxmert/src/lxrt/modeling.py`` ACT2FN['gelu']).

Mixing them up costs ~1e-3 per-activation drift, which is exactly the parity
budget, so both are explicit here.
"""

import jax
import jax.numpy as jnp


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


def gelu_erf(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {
    "gelu": gelu_tanh,  # TF-stack meaning of "gelu" in bert_config.json
    "gelu_erf": gelu_erf,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "linear": lambda x: x,
}
