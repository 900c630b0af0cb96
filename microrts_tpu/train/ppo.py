"""PPO trainer for the gridnet env: fully on-device rollout + learner.

Replaces the reference's Python<->JVM per-step tensor marshalling
(SURVEY.md §3.3) with a single jitted program: `lax.scan` rollouts over
vmapped envs (policy player 0 vs a scripted on-device opponent or frozen
self), GAE, and minibatched clipped-PPO updates.  Data parallelism: envs
and minibatches shard over the mesh's "env" axis; gradients are averaged
with `psum` (via `shard_map`) so the same code runs 1 chip or a pod slice.

Default reward weighting follows the MicroRTS-Py convention:
(winloss, resourcegather, produceworker, producebuilding, producecombat,
attack) x (10, 1, 1, 0.2, 4, 1).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.types import State
from ..env.gridnet import GridnetEnv
from ..env.vec import VecGridnetEnv
from ..models.gridnet_policy import (ActionSpace, GridnetPolicy,
                                     action_logprob, sample_action)

DEFAULT_REWARD_WEIGHTS = (10.0, 1.0, 1.0, 0.2, 4.0, 1.0)


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_envs: int = 64
    rollout_len: int = 128
    max_steps: int = 2000
    lr: float = 2.5e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    epochs: int = 4
    minibatches: int = 4
    max_grad_norm: float = 0.5
    reward_weights: Tuple[float, ...] = DEFAULT_REWARD_WEIGHTS


class TrainState(struct.PyTreeNode):
    params: dict
    opt_state: dict
    env_states: State
    env_steps: jax.Array
    key: jax.Array
    update_count: jax.Array


class Transition(NamedTuple):
    obs: jax.Array       # [N, H, W, C]
    mask: jax.Array      # [N, H, W, A]
    action: jax.Array    # [N, H, W, 7]
    logprob: jax.Array   # [N]
    value: jax.Array     # [N]
    reward: jax.Array    # [N]
    done: jax.Array      # [N]


class PPOTrainer:
    def __init__(self, env: GridnetEnv, cfg: PPOConfig = PPOConfig(),
                 opponent: Optional[Callable] = None,
                 mesh: Optional[Mesh] = None, selfplay: bool = False,
                 tx: Optional[optax.GradientTransformation] = None,
                 model: Optional[GridnetPolicy] = None):
        self.env = env
        self.cfg = cfg
        self.selfplay = selfplay
        self.vec = VecGridnetEnv(env, cfg.num_envs, cfg.max_steps)
        ecfg = env.cfg.engine
        self.space = ActionSpace(ecfg.num_types, 2 * ecfg.max_range + 1)
        self.model = model if model is not None else GridnetPolicy(self.space)
        self.opponent = opponent
        self.tx = tx if tx is not None else optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr))
        self.mesh = mesh
        nr = env.num_rewards
        w = np.zeros(nr, np.float32)
        for i, wv in enumerate(cfg.reward_weights[:nr]):
            w[i] = wv
        self.reward_w = jnp.asarray(w)
        # the wins metric reads the winloss reward component by NAME so a
        # reconfigured/reordered env can't silently report garbage
        self._winloss_idx = env.cfg.reward_fns.index("winloss")

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> TrainState:
        k1, k2, k3 = jax.random.split(key, 3)
        obs = self._obs(self.env.reset(k1))[None]
        params = self.model.init(k2, obs)
        env_states, env_steps = self.vec.reset(k3)
        return TrainState(params=params, opt_state=self.tx.init(params),
                          env_states=env_states, env_steps=env_steps,
                          key=key, update_count=jnp.int32(0))

    def _obs(self, state: State) -> jax.Array:
        return self.env.observation_onehot(state, 0)

    def _mask(self, state: State) -> jax.Array:
        return self.env.masks(state, 0)[..., 1:].astype(bool)

    def _opp_action(self, state: State, key: jax.Array) -> jax.Array:
        if self.opponent is None:
            return jnp.zeros((self.env.h, self.env.w, 7), jnp.int32)
        return self.opponent(state, 1, key)

    def _selfplay_opp(self, params, state: State, key: jax.Array):
        """Mirror self-play: player 1 acts with the SAME policy on its own
        observation/masks (the JNIGridnetClientSelfPlay training mode)."""
        obs = self.env.observation_onehot(state, 1)[None]
        logits, _ = self.model.apply(params, obs)
        mask = self.env.masks(state, 1)[..., 1:].astype(bool)
        a, _, _ = sample_action(key, logits[0], mask, self.space)
        return a

    # ------------------------------------------------------------------
    def _rollout(self, ts: TrainState, env_ids: jax.Array):
        """Rollout with per-env RNG streams keyed by the GLOBAL env index,
        so the trajectory is identical whatever mesh the envs shard over
        (SURVEY.md §4: "same trajectory independent of mesh shape")."""
        cfg = self.cfg

        base = jax.random.fold_in(ts.key, ts.update_count)
        env_keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(env_ids)

        def step(carry, _):
            states, steps, keys = carry
            ks3 = jax.vmap(lambda k: jax.random.split(k, 3))(keys)
            skeys, okeys, keys = ks3[:, 0], ks3[:, 1], ks3[:, 2]
            obs = jax.vmap(self._obs)(states)
            mask = jax.vmap(self._mask)(states)
            logits, value = self.model.apply(ts.params, obs)
            action, lp_map, _ = jax.vmap(
                lambda k, l, m: sample_action(k, l, m, self.space))(
                    skeys, logits, mask)
            can_act = mask[..., :6].any(-1)
            logprob = jnp.sum(jnp.where(can_act, lp_map, 0.0), axis=(-2, -1))
            if self.selfplay:
                a1 = jax.vmap(lambda s, k: self._selfplay_opp(
                    ts.params, s, k))(states, okeys)
            else:
                a1 = jax.vmap(self._opp_action)(states, okeys)
            nstates, nsteps, _, rewards, _, reset = self.vec.step(
                states, steps, action, a1)
            r = jnp.sum(rewards[:, 0, :] * self.reward_w, axis=-1)
            tr = Transition(obs=obs, mask=mask, action=action,
                            logprob=logprob, value=value, reward=r,
                            done=reset)
            # terminal winloss (+1 only on a PLAYER-0 WIN reset; cutoff
            # resets carry 0) — lets metrics report wins/episodes
            win = reset & (rewards[:, 0, self._winloss_idx] > 0)
            return (nstates, nsteps, keys), (tr, win)

        (states, steps, _), (traj, wins) = jax.lax.scan(
            step, (ts.env_states, ts.env_steps, env_keys), None,
            length=cfg.rollout_len)
        last_obs = jax.vmap(self._obs)(states)
        _, last_value = self.model.apply(ts.params, last_obs)
        return ts.replace(env_states=states, env_steps=steps), \
            traj, last_value, jnp.sum(wins)

    def _gae(self, traj: Transition, last_value):
        cfg = self.cfg

        def scan_fn(carry, tr):
            adv_next, v_next = carry
            nonterm = 1.0 - tr.done.astype(jnp.float32)
            delta = tr.reward + cfg.gamma * v_next * nonterm - tr.value
            adv = delta + cfg.gamma * cfg.gae_lambda * nonterm * adv_next
            return (adv, tr.value), adv

        _, advs = jax.lax.scan(scan_fn,
                               (jnp.zeros_like(last_value), last_value),
                               traj, reverse=True)
        return advs, advs + traj.value

    def _loss(self, params, batch: Transition, adv_n, ret):
        """Clipped-PPO loss over one minibatch.  ``adv_n`` arrives already
        normalized (normalization is global so sharded == unsharded)."""
        cfg = self.cfg
        logits, value = self.model.apply(params, batch.obs)
        lp_map, ent_map = jax.vmap(
            lambda l, m, a: action_logprob(l, m, a, self.space))(
                logits, batch.mask, batch.action)
        can_act = batch.mask[..., :6].any(-1)
        logprob = jnp.sum(jnp.where(can_act, lp_map, 0.0), axis=(-2, -1))
        entropy = jnp.mean(jnp.sum(jnp.where(can_act, ent_map, 0.0),
                                   axis=(-2, -1)))
        ratio = jnp.exp(logprob - batch.logprob)
        pg1 = ratio * adv_n
        pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n
        pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))
        v_loss = 0.5 * jnp.mean((value - ret) ** 2)
        loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
        return loss, dict(pg_loss=pg_loss, v_loss=v_loss, entropy=entropy,
                          ratio=jnp.mean(ratio))

    # ------------------------------------------------------------------
    def update(self, ts: TrainState, env_ids: Optional[jax.Array] = None,
               axis_name: Optional[str] = None):
        """One PPO update: rollout + epochs x minibatch SGD.  Jittable.

        Designed so the SAME program runs on one device or sharded over a
        mesh axis (``update_sharded``): per-env RNG streams key off the
        global env index (trajectories identical under any sharding);
        minibatch m = the envs with global index = m (mod minibatches), so
        each device holds an equal slice of every minibatch and
        pmean-of-local-grad-means equals the global mean; advantage
        normalization is computed globally.  Gradients therefore agree up
        to fp32 reduction-order rounding only (exactly verified with SGD in
        tests/test_parallel.py; with Adam the ~1e-7 grad noise can flip
        sign(g) on near-zero gradients and move a weight by a full lr).
        """
        cfg = self.cfg
        if env_ids is None:
            env_ids = jnp.arange(cfg.num_envs, dtype=jnp.uint32)
        ts, traj, last_value, wins = self._rollout(ts, env_ids)
        adv, ret = self._gae(traj, last_value)

        def gmean(x):
            m = jnp.mean(x)
            return jax.lax.pmean(m, axis_name) if axis_name else m

        m1 = gmean(adv)
        m2 = gmean(adv * adv)
        adv_n = (adv - m1) * jax.lax.rsqrt(
            jnp.maximum(m2 - m1 * m1, 0.0) + 1e-8)

        # minibatch m = envs with (global index % minibatches) == m.
        # Locally env g*M + j has global index base + g*M + j, congruent to
        # j mod M whenever the local env count divides by M — enforced here.
        M = cfg.minibatches
        N = cfg.num_envs
        T = cfg.rollout_len
        assert N % M == 0, "num_envs must divide by minibatches (per device)"

        def to_mb(x):  # [T, N, ...] -> [M, T*(N//M), ...]
            r = x.shape[2:]
            return jnp.moveaxis(x.reshape((T, N // M, M) + r), 2, 0) \
                      .reshape((M, T * (N // M)) + r)

        flat = jax.tree.map(to_mb, traj)
        adv_mb = to_mb(adv_n)
        ret_mb = to_mb(ret)

        def epoch(carry, _):
            params, opt_state = carry

            def minibatch(carry, batch):
                params, opt_state = carry
                bt, badv, bret = batch
                (loss, aux), grads = jax.value_and_grad(
                    self._loss, has_aux=True)(params, bt, badv, bret)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), auxs = jax.lax.scan(
                minibatch, (params, opt_state), (flat, adv_mb, ret_mb))
            return (params, opt_state), auxs

        (params, opt_state), auxs = jax.lax.scan(
            epoch, (ts.params, ts.opt_state), None, length=cfg.epochs)
        metrics = jax.tree.map(lambda x: x[-1, -1], auxs)
        metrics["mean_reward"] = gmean(traj.reward)
        episodes = jnp.sum(traj.done)
        metrics["episodes"] = (jax.lax.psum(episodes, axis_name)
                               if axis_name else episodes)
        metrics["wins"] = (jax.lax.psum(wins, axis_name)
                           if axis_name else wins)
        if axis_name:
            for k in ("pg_loss", "v_loss", "entropy", "ratio"):
                metrics[k] = jax.lax.pmean(metrics[k], axis_name)
        return ts.replace(params=params, opt_state=opt_state,
                          key=jax.random.fold_in(ts.key, 0x9e3779b9),
                          update_count=ts.update_count + 1), metrics

    # ------------------------------------------------------------------
    def update_sharded(self, ts: TrainState):
        """Data-parallel update over the mesh's axes: each device rolls
        out its env shard and computes grads on its minibatch slice;
        grads/metrics reduce with psum over ICI (and DCN on a multi-axis
        (host, env) mesh — envs shard over the axis PRODUCT and the
        reductions name every axis, routed hierarchically by XLA).
        Numerically equivalent to ``update`` on one device — identical
        trajectories, gradients equal up to reduction-order rounding
        (tests/test_parallel.py proves it with an SGD optimizer where
        rounding is not amplified)."""
        mesh = self.mesh
        assert mesh is not None, "construct PPOTrainer with a mesh"
        cfg = self.cfg
        n_dev = mesh.devices.size
        assert cfg.num_envs % n_dev == 0
        n_loc = cfg.num_envs // n_dev
        assert n_loc % cfg.minibatches == 0, \
            "per-device envs must divide by minibatches for dp equivalence"
        names = tuple(mesh.axis_names)

        rep = P()
        env_ax = P(names)
        state_spec = jax.tree.map(lambda _: env_ax, ts.env_states)

        def local_update(params, opt_state, env_states, env_steps, key,
                         update_count):
            lts = TrainState(params=params, opt_state=opt_state,
                             env_states=env_states, env_steps=env_steps,
                             key=key, update_count=update_count)
            # local rollout on this device's env shard: a shallow clone of
            # the trainer with the per-device batch size and a psum'd tx
            sub = PPOTrainer.__new__(PPOTrainer)
            sub.__dict__.update(self.__dict__)
            sub.cfg = dataclasses.replace(cfg, num_envs=n_loc)
            sub.vec = VecGridnetEnv(self.env, n_loc, cfg.max_steps)
            sub.tx = _PsumTx(self.tx, names)
            # linearized (row-major) device index over all mesh axes
            dev_idx = jnp.uint32(0)
            for nm in names:
                dev_idx = (dev_idx * mesh.shape[nm]
                           + jax.lax.axis_index(nm).astype(jnp.uint32))
            env_ids = dev_idx * n_loc + jnp.arange(n_loc, dtype=jnp.uint32)
            nts, metrics = PPOTrainer.update(sub, lts, env_ids=env_ids,
                                             axis_name=names)
            return (nts.params, nts.opt_state, nts.env_states,
                    nts.env_steps, nts.key, nts.update_count, metrics)

        fn = jax.shard_map(
            local_update, mesh=mesh,
            in_specs=(rep, rep, state_spec, env_ax, rep, rep),
            out_specs=(rep, rep, state_spec, env_ax, rep, rep, rep),
            check_vma=False)
        params, opt_state, env_states, env_steps, key, upd, metrics = fn(
            ts.params, ts.opt_state, ts.env_states, ts.env_steps, ts.key,
            ts.update_count)
        return TrainState(params=params, opt_state=opt_state,
                          env_states=env_states, env_steps=env_steps,
                          key=key, update_count=upd), metrics


class _PsumTx:
    """Wrap an optax tx so gradients are mean-reduced over the mesh
    axis/axes before the update — the learner's only collective."""

    def __init__(self, tx, axis="env"):
        self._tx = tx
        self._axis = axis

    def init(self, params):
        return self._tx.init(params)

    def update(self, grads, opt_state, params=None):
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(g, self._axis), grads)
        return self._tx.update(grads, opt_state, params)
