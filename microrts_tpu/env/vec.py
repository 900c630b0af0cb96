"""Vectorized, auto-resetting gridnet env.

The reference's "vectorized" client steps env objects sequentially in a Java
for-loop (JNIGridnetVecClient.java:10-13, :219-307).  Here the batch is a
leading axis handled by ``vmap`` — thousands of lockstep envs per chip — and
auto-reset is in-graph, preserving the reference's splicing semantics: when
an env reports done (or hits ``max_steps``), the returned rewards/dones are
the terminal ones while the returned observation is the fresh reset obs
(JNIGridnetVecClient.java:224-236, :253-272).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..engine.types import State
from .gridnet import GridnetEnv


class VecGridnetEnv:
    """Batched self-play env over one map.  All methods jittable."""

    def __init__(self, env: GridnetEnv, num_envs: int, max_steps: int = 5000):
        self.env = env
        self.num_envs = num_envs
        self.max_steps = max_steps

    def reset(self, key: jax.Array) -> Tuple[State, jax.Array]:
        keys = jax.random.split(key, self.num_envs)
        states = jax.vmap(self.env.reset)(keys)
        steps = jnp.zeros(self.num_envs, jnp.int32)
        return states, steps

    def step(self, states: State, steps: jax.Array, a0: jax.Array,
             a1: jax.Array):
        """Step all envs; auto-reset finished ones.

        Returns (states', steps', obs [2, N, 6, H, W], rewards [2, N, NR],
        dones [2, N, NR], reset_mask [N])."""
        env = self.env
        nstates, rewards, _ = jax.vmap(env.step)(states, a0, a1)
        done_vec = jax.vmap(env.dones)(nstates)          # [N, NR]
        steps1 = steps + 1
        reset_mask = done_vec[:, 0] | (steps1 >= self.max_steps)

        fresh_keys = jax.vmap(lambda s: jax.random.split(s.key)[1])(nstates)
        fresh = jax.vmap(env.reset)(fresh_keys)
        out_states = jax.tree.map(
            lambda f, n: jnp.where(
                reset_mask.reshape((-1,) + (1,) * (n.ndim - 1)), f, n),
            fresh, nstates)
        out_steps = jnp.where(reset_mask, 0, steps1)

        obs = jnp.stack([jax.vmap(env.observation, in_axes=(0, None))(
            out_states, p) for p in (0, 1)])
        dones = jnp.stack([done_vec, done_vec])
        return out_states, out_steps, obs, rewards, dones, reset_mask

    def masks(self, states: State):
        return jnp.stack([jax.vmap(self.env.masks, in_axes=(0, None))(
            states, p) for p in (0, 1)])
