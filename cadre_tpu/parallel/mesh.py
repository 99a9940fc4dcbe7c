"""Device mesh construction and sharding helpers.

The reference's distributed plane is 4 worker processes + shared-memory
gradient buffers + a chief applying Adam (SURVEY §2.7). The TPU-native
equivalent is a 1-D `data` mesh: rollout minibatches shard over `data`,
params/optimizer state replicate, and gradient aggregation is a psum over
ICI inside the jitted update (cadre_tpu/rl/ppo.py make_update_fn).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place a host pytree with leading batch axis sharded over the mesh."""
    sh = batch_sharded(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
