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


def env_health(state: State, rewards: jax.Array, cfg) -> jax.Array:
    """Per-env failure detector (SURVEY §5's failure-detection analog —
    the reference's training stack has no guard against corrupted envs;
    production fleets need one).  Flags an env as FAILED when its state
    violates engine invariants or its rewards went non-finite:

    - any non-finite reward,
    - hp outside [0, max over the UTT] on an occupied cell,
    - negative player resources or absurd stockpiles (> 10^6),
    - unit type id outside the UTT,
    - negative remaining action ticks on a busy cell.

    Shapes: state leaves [..., H, W]; rewards [..., NR]; returns bool [...].
    """
    max_hp = max(cfg.hp)
    occ = state.utype > 0
    red = tuple(range(-2, 0))
    bad_hp = jnp.any(occ & ((state.hp <= 0) | (state.hp > max_hp)),
                     axis=red)
    bad_type = jnp.any(state.utype > cfg.num_types, axis=red)
    bad_ticks = jnp.any(state.busy & (state.aticks < 0), axis=red)
    bad_res = jnp.any((state.resources < 0)
                      | (state.resources > 1_000_000), axis=-1)
    bad_rew = ~jnp.all(jnp.isfinite(rewards), axis=-1)
    return bad_hp | bad_type | bad_ticks | bad_res | bad_rew


class VecGridnetEnv:
    """Batched self-play env over one map.  All methods jittable.

    ``quarantine=True`` adds the per-env failure detector: envs whose
    state corrupts or whose rewards go non-finite are force-reset in the
    same step (their lane keeps training on a fresh episode instead of
    poisoning the batch) and reported in the step output so the trainer
    can count quarantine events.
    """

    def __init__(self, env: GridnetEnv, num_envs: int, max_steps: int = 5000,
                 quarantine: bool = False):
        self.env = env
        self.num_envs = num_envs
        self.max_steps = max_steps
        self.quarantine = quarantine

    def reset(self, key: jax.Array) -> Tuple[State, jax.Array]:
        keys = jax.random.split(key, self.num_envs)
        states = jax.vmap(self.env.reset)(keys)
        steps = jnp.zeros(self.num_envs, jnp.int32)
        return states, steps

    def step(self, states: State, steps: jax.Array, a0: jax.Array,
             a1: jax.Array):
        """Step all envs; auto-reset finished ones.

        Returns (states', steps', obs [2, N, 6, H, W], rewards [2, N, NR],
        dones [2, N, NR], reset_mask [N]).  With ``quarantine`` on, the
        reset_mask also covers failed envs (their rewards are zeroed so a
        NaN never reaches the learner)."""
        env = self.env
        nstates, rewards, _ = jax.vmap(env.step)(states, a0, a1)
        done_vec = jax.vmap(env.dones)(nstates)          # [N, NR]
        steps1 = steps + 1
        reset_mask = done_vec[:, 0] | (steps1 >= self.max_steps)
        if self.quarantine:
            # rewards from vmapped env.step are [N, 2, NR]
            failed = env_health(nstates, rewards.reshape(
                rewards.shape[0], -1), env.cfg.engine)
            reset_mask = reset_mask | failed
            rewards = jnp.where(failed[:, None, None],
                                0.0, jnp.nan_to_num(rewards))

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
