"""Device-mesh helpers for data-parallel training and frame-sharded inference.

The reference's only distribution story is single-node ``nn.DataParallel`` +
synchronized BatchNorm (SURVEY.md §5.8). TPU-native replacement: one pjit
program over a 1-D 'data' mesh — batches sharded over ICI, parameters
replicated, BN statistics globally correct because ``jnp.mean`` over a
sharded batch axis all-reduces automatically.

For inference, frames of a rollout are independent given the integrated
displacement stack, so the same helpers shard the frame axis ('data' acts as
the frame axis) — the honest "sequence parallelism" of this workload
(SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data",
                batch_size: Optional[int] = None):
    """Shard array leaves along their leading (batch) dimension.

    A leaf is sharded only when its leading dim is divisible by the mesh
    size — and, when ``batch_size`` is given, only when its leading dim
    equals ``batch_size`` (so non-batch-leading arrays such as (H, W, 2)
    hints are replicated rather than silently mis-sharded). Leaves that
    look batch-leading but are NOT divisible raise, instead of XLA's
    opaque uneven-sharding error later.
    """
    n = mesh.devices.size

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            lead = x.shape[0]
            if batch_size is not None and lead != batch_size:
                return jax.device_put(x, NamedSharding(mesh, P()))
            if lead % n != 0:
                if batch_size is None:
                    return jax.device_put(x, NamedSharding(mesh, P()))
                raise ValueError(
                    f"batch leaf with leading dim {lead} not divisible by "
                    f"mesh size {n}: shape {x.shape}"
                )
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
