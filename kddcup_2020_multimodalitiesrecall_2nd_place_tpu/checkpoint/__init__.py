from .importers import (
    imagebert_a_from_tf,
    imagebert_b_from_tf,
    lxmert_from_torch,
    normalize_torch_keys,
)
from .orbax_io import (
    flatten_tree,
    load_npz,
    restore_pytree,
    save_npz,
    save_pytree,
    unflatten_tree,
)
from .tf_bundle import read_tf_checkpoint
from .torch_io import read_torch_state_dict

__all__ = [
    "flatten_tree",
    "imagebert_a_from_tf",
    "imagebert_b_from_tf",
    "load_npz",
    "lxmert_from_torch",
    "normalize_torch_keys",
    "read_tf_checkpoint",
    "read_torch_state_dict",
    "restore_pytree",
    "save_npz",
    "save_pytree",
    "unflatten_tree",
]
