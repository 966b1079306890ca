"""PyTorch ``.pth`` state_dict reading without assuming CUDA availability.

Covers the LXMERT ``BEST.pth`` checkpoint (``tasks/kdd_model.py:131-152``):
``torch.load(map_location='cpu')`` then tensors -> numpy. DataParallel
``module.`` prefixes and HF gamma/beta renames are handled downstream by
``importers.normalize_torch_keys``.
"""

from __future__ import annotations

import numpy as np


def read_torch_state_dict(path) -> dict[str, np.ndarray]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    out = {}
    for k, v in state.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out
