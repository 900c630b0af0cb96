"""Device-mesh helpers: env/data sharding for rollouts and learners.

The reference has no parallelism to port (SURVEY.md §2.10): its "vectorized"
client is a sequential Java loop.  Here scale-out is a first-class design:
envs are independent, so simulation shards embarrassingly over a mesh axis
("env"); the learner is data-parallel over the same axis, with gradients
reduced by `psum` over ICI.  Multi-host runs use the same code — the mesh
simply spans hosts (dp over DCN/ICI picked by XLA).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis: str = "env") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "env"):
    """Place a pytree with leading batch axis sharded across the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
