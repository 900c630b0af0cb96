"""Map pools: many maps, one compiled program.

The reference runs experiments over map lists host-side (Experimenter.java:
37-171 iterates maps sequentially).  Here a pool of maps is padded to one
common (H, W) with wall borders, stacked into a bank of initial states, and
each env in the batch carries a map index — so a single jitted step serves
a heterogeneous pool and auto-reset restores each env's own map
(BASELINE.json configs[3-4]).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.pgs import PhysicalGameState, TERRAIN_WALL
from ..engine.types import State, state_from_pgs
from ..engine.utt import UnitTypeTable
from .gridnet import GridnetEnv, REWARD_NAMES


def pad_pgs(pgs: PhysicalGameState, h: int, w: int) -> PhysicalGameState:
    """Embed a map at the top-left of an (h, w) board; outside = walls."""
    assert pgs.height <= h and pgs.width <= w
    terrain = np.full((h, w), TERRAIN_WALL, np.int8)
    terrain[:pgs.height, :pgs.width] = \
        np.asarray(pgs.terrain, np.int8).reshape(pgs.height, pgs.width)
    out = PhysicalGameState(w, h, terrain.reshape(-1))
    out.players = [type(p)(p.ID, p.resources) for p in pgs.players]
    out.units = [type(u)(u.ID, u.player, u.type_id, u.x, u.y, u.resources,
                         u.hitpoints) for u in pgs.units]
    return out


class MapPoolVecEnv:
    """Auto-resetting vector env over a pool of maps (one env = one map
    assignment, round-robin by default)."""

    def __init__(self, map_paths: Sequence[str], num_envs: int,
                 utt: Optional[UnitTypeTable] = None, max_steps: int = 5000,
                 reward_fns=REWARD_NAMES[:6], partial_obs: bool = False):
        self.utt = utt if utt is not None else UnitTypeTable(2)
        pgss = [PhysicalGameState.load(p, self.utt) for p in map_paths]
        self.h = max(p.height for p in pgss)
        self.w = max(p.width for p in pgss)
        # build the shared-shape env from the first padded map
        padded = [pad_pgs(p, self.h, self.w) for p in pgss]
        self.env = GridnetEnv.__new__(GridnetEnv)
        e = self.env
        e.partial_obs = partial_obs
        e.frame_skip = 1
        e.utt = self.utt
        e.pgs0 = padded[0]
        e.h, e.w = self.h, self.w
        from ..engine.types import EngineConfig
        from ..engine import kernel as K
        ecfg = EngineConfig.from_utt(self.utt, self.h, self.w)
        e.engine = K.make_engine(ecfg)

        def tid(name):
            ut = self.utt.get_unit_type(name)
            return ut.ID if ut is not None else -1

        from .gridnet import EnvConfig
        e.cfg = EnvConfig(
            engine=ecfg, reward_fns=tuple(reward_fns),
            worker_id=tid("Worker"), base_id=tid("Base"),
            barracks_id=tid("Barracks"), light_id=tid("Light"),
            heavy_id=tid("Heavy"), ranged_id=tid("Ranged"))
        e._init_state = state_from_pgs(padded[0].clone(), ecfg)

        # the bank of initial states [M, ...]
        inits = [state_from_pgs(p.clone(), ecfg) for p in padded]
        self.bank: State = jax.tree.map(
            lambda *xs: jnp.stack(xs), *inits)
        self.num_maps = len(map_paths)
        self.num_envs = num_envs
        self.max_steps = max_steps
        self.map_idx = jnp.arange(num_envs, dtype=jnp.int32) % self.num_maps

    # ------------------------------------------------------------------
    def _fresh(self, idx: jax.Array, key: jax.Array) -> State:
        s = jax.tree.map(lambda b: b[idx], self.bank)
        return s.replace(key=key)

    def reset(self, key: jax.Array) -> Tuple[State, jax.Array]:
        keys = jax.random.split(key, self.num_envs)
        states = jax.vmap(self._fresh)(self.map_idx, keys)
        return states, jnp.zeros(self.num_envs, jnp.int32)

    def step(self, states: State, steps: jax.Array, a0, a1):
        """As env.vec.VecGridnetEnv.step, but auto-reset restores each
        env's own map from the bank."""
        env = self.env
        nstates, rewards, _ = jax.vmap(env.step)(states, a0, a1)
        done_vec = jax.vmap(env.dones)(nstates)
        steps1 = steps + 1
        reset_mask = done_vec[:, 0] | (steps1 >= self.max_steps)
        fresh_keys = jax.vmap(lambda s: jax.random.split(s.key)[1])(nstates)
        fresh = jax.vmap(self._fresh)(self.map_idx, fresh_keys)
        out_states = jax.tree.map(
            lambda f, n: jnp.where(
                reset_mask.reshape((-1,) + (1,) * (n.ndim - 1)), f, n),
            fresh, nstates)
        out_steps = jnp.where(reset_mask, 0, steps1)
        obs = jnp.stack([jax.vmap(env.observation, in_axes=(0, None))(
            out_states, p) for p in (0, 1)])
        return out_states, out_steps, obs, rewards, \
            jnp.stack([done_vec, done_vec]), reset_mask
