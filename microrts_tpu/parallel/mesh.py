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


def make_mesh(n_devices=None, axis="env") -> Mesh:
    """Build a device mesh.

    ``n_devices``: an int (or None = all devices) for a 1-axis mesh named
    ``axis``; or a SHAPE TUPLE for a multi-axis mesh — e.g.
    ``make_mesh((2, 4))`` is a (host, env) mesh for 2 hosts x 4 chips,
    with ``axis`` then a tuple of names (default ``("host", "env")``).
    Envs shard over the PRODUCT of the axes (specs use the tuple form
    ``P(axis_names)``), so the same training step runs on a single chip,
    one host's chips, or a multi-host slice: XLA routes the (host, env)
    reductions hierarchically — ICI within a host, DCN across hosts."""
    devs = jax.devices()
    if isinstance(n_devices, (tuple, list)):
        names = tuple(axis) if isinstance(axis, (tuple, list)) \
            else ("host", "env")
        n = int(np.prod(n_devices))
        return Mesh(np.array(devs[:n]).reshape(tuple(n_devices)), names)
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, tree, axis=None):
    """Place a pytree with leading batch axis sharded across the mesh.
    Default: shard over ALL mesh axes (their product)."""
    if axis is None:
        axis = tuple(mesh.axis_names)
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
