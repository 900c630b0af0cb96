"""Drop-in style facade matching the MicroRTS-Py vec-env API.

Users of the reference drive ``MicroRTSGridModeVecEnv`` (numpy in/out,
gameStep semantics of JNIGridnetVecClient).  This wrapper exposes the same
surface over the on-device engine: numpy actions [num_envs, H*W, 7],
stacked observations, per-reward-function reward vectors, done flags with
auto-reset splicing, ``get_action_mask()``, and ``render()``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..engine.utt import UnitTypeTable
from ..env.gridnet import GridnetEnv
from ..env.vec import VecGridnetEnv


class MicroRTSGridModeVecEnv:
    """Self-play gridnet vec env with the MicroRTS-Py calling convention.

    Differences from the reference client (intentional): both players'
    actions come from the caller (`step(actions)` with actions[0] = player-0
    batch, actions[1] = player-1 batch) or player 1 runs an on-device bot
    via ``bot_opponent``; everything executes in one jitted program instead
    of a Python<->JVM round-trip per env.
    """

    metadata = {"render.modes": ["rgb_array", "ansi"]}

    def __init__(self, num_envs: int = 8,
                 map_paths: Sequence[str] = ("maps/16x16/basesWorkers16x16.xml",),
                 reward_weight: Optional[np.ndarray] = None,
                 utt_version: int = 2, max_steps: int = 2000,
                 partial_obs: bool = False,
                 bot_opponent: Optional[str] = None,
                 seed: int = 0):
        import jax

        from ..utils.assets import asset_path
        path = asset_path(map_paths[0])
        self.utt = UnitTypeTable(utt_version)
        self.env = GridnetEnv(path, self.utt, partial_obs=partial_obs)
        self.vec = VecGridnetEnv(self.env, num_envs, max_steps)
        self.num_envs = num_envs
        self.height, self.width = self.env.h, self.env.w
        self.reward_weight = (np.asarray(reward_weight) if reward_weight
                              is not None else
                              np.array([10.0, 1.0, 1.0, 0.2, 4.0, 1.0]))
        self._key = jax.random.PRNGKey(seed)
        self._bot = None
        if bot_opponent is not None:
            from ..config import make_bot
            self._bot = make_bot(bot_opponent, self.env)
        self._jit_step = jax.jit(self.vec.step)
        self._jit_masks = jax.jit(self.vec.masks)
        self._states = None
        self._steps = None

    # ------------------------------------------------------------------
    @property
    def action_space_dims(self):
        return self.env.action_nvec()

    def reset(self) -> np.ndarray:
        import jax

        self._key, sub = jax.random.split(self._key)
        self._states, self._steps = self.vec.reset(sub)
        obs = jax.vmap(self.env.observation, in_axes=(0, None))(
            self._states, 0)
        return np.asarray(obs)

    def step(self, actions):
        """actions: [num_envs, H*W, 7] (player 0) or a pair of such arrays
        for both players when no bot opponent is configured.
        Returns (obs [N, 6, H, W], reward [N], done [N], infos)."""
        import jax
        import jax.numpy as jnp

        a = np.asarray(actions)
        if a.ndim == 4 and a.shape[0] == 2:          # both players given
            a0, a1 = a[0], a[1]
        else:
            a0 = a
            if self._bot is not None:
                self._key, sub = jax.random.split(self._key)
                keys = jax.random.split(sub, self.num_envs)
                a1 = np.asarray(jax.vmap(self._bot, in_axes=(0, None, 0))(
                    self._states, 1, keys))
            else:
                a1 = np.zeros_like(a0)
        a0 = jnp.asarray(a0.reshape(self.num_envs, self.height, self.width,
                                    7), jnp.int32)
        a1 = jnp.asarray(a1.reshape(self.num_envs, self.height, self.width,
                                    7), jnp.int32)
        (self._states, self._steps, obs, rewards, dones,
         reset_mask) = self._jit_step(self._states, self._steps, a0, a1)
        raw = np.asarray(rewards[:, 0, :])           # player-0 rewards [N, R]
        reward = raw @ self.reward_weight[:raw.shape[1]]
        done = np.asarray(reset_mask)
        infos = [{"raw_rewards": raw[i]} for i in range(self.num_envs)]
        return np.asarray(obs[0]), reward, done, infos

    def get_action_mask(self) -> np.ndarray:
        """[num_envs, H*W, 78-style] mask for player 0 (JNIGridnetClient
        layout without the leading can-act bit, as MicroRTS-Py exposes)."""
        m = np.asarray(self._jit_masks(self._states)[0])
        return m.reshape(self.num_envs, self.height * self.width, -1)[..., 1:]

    def render(self, mode: str = "rgb_array", env_idx: int = 0):
        import jax

        one = jax.tree.map(lambda x: x[env_idx], self._states)
        if mode == "ansi":
            from ..render import render_ansi
            return render_ansi(one, self.utt)
        from ..render import render_rgb
        return render_rgb(one, self.utt)

    def close(self):
        pass
