"""VGG19 feature extractor for perceptual/style losses.

Flax NHWC re-implementation of the 5-slice VGG19 of reference
``models/networks/architectures.py:82-115`` (torchvision vgg19.features cut
after ReLUs 1_1, 2_1, 3_1, 4_1, 5_1). The reference feeds [-1, 1] images
directly with no input normalization; we match that.

Weights: ``import_vgg19`` converts a torchvision ``vgg19`` state_dict
(``features.{i}.weight/bias``). Without pretrained weights the module still
runs (random init) so the training graph compiles/executes — quality parity
requires the real weights, supplied as a .pth by the user.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
from flax import linen as nn

# torchvision vgg19.features conv layer indices and channels, through 5_1
_CONVS = [
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256), (16, 256),
    (19, 512), (21, 512), (23, 512), (25, 512),
    (28, 512),
]
# feature taps: after ReLU of conv index i (torchvision layer index)
_SLICE_ENDS = [0, 5, 10, 19, 28]  # conv layers whose ReLU output is returned
_POOL_BEFORE = [5, 10, 19, 28]  # maxpool precedes these conv layers


class VGG19Features(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        outs = []
        for li, ch in _CONVS:
            if li in _POOL_BEFORE:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{li}")(x)
            x = jax.nn.relu(x)
            if li in _SLICE_ENDS:
                outs.append(x)
        return outs


def import_vgg19(sd) -> Dict:
    """torchvision vgg19 state_dict → VGG19Features params tree."""
    import numpy as np

    params = {}
    for li, _ch in _CONVS:
        w = sd[f"features.{li}.weight"]
        b = sd[f"features.{li}.bias"]
        if hasattr(w, "detach"):
            w = w.detach().cpu().numpy()
            b = b.detach().cpu().numpy()
        params[f"conv_{li}"] = {
            "kernel": np.array(w, dtype=np.float32).transpose(2, 3, 1, 0),
            "bias": np.array(b, dtype=np.float32),
        }
    return {"params": params}
