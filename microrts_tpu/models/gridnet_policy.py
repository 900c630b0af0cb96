"""Gridnet actor-critic: per-cell factored-categorical policy + value head.

The learned-policy counterpart of the ConnAALL gridnet action space
(UnitAction.fromVectorAction layout [6, 4, 4, 4, 4, T, (2R+1)^2],
UnitAction.java:675-709) — the network the RL bridge exists to serve.
Designed MXU-first: all compute is 3x3/1x1 convs (batched matmuls on the
systolic array), bf16 activations by default with fp32 params and logits.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class ActionSpace:
    """Per-cell component sizes: [6, 4, 4, 4, 4, T, D*D]."""
    num_types: int
    diam: int

    @property
    def sizes(self) -> Tuple[int, ...]:
        return (6, 4, 4, 4, 4, self.num_types, self.diam * self.diam)

    @property
    def total(self) -> int:
        return sum(self.sizes)


class ResBlock(nn.Module):
    ch: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype)(nn.relu(x))
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype)(nn.relu(h))
        return x + h


class GridnetPolicy(nn.Module):
    """obs [*, H, W, C] -> (per-cell logits [*, H, W, A_total], value [*])."""
    action_space: ActionSpace
    width: int = 64
    blocks: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(self.dtype)
        x = nn.Conv(self.width, (3, 3), dtype=self.dtype)(x)
        for _ in range(self.blocks):
            x = ResBlock(self.width, self.dtype)(x)
        x = nn.relu(x)
        logits = nn.Conv(self.action_space.total, (1, 1),
                         dtype=jnp.float32)(x.astype(jnp.float32))
        v = jnp.mean(x.astype(jnp.float32), axis=(-3, -2))
        v = nn.Dense(128)(v)
        v = nn.Dense(1)(nn.relu(v))[..., 0]
        return logits, v


def split_components(flat: jax.Array, space: ActionSpace):
    out = []
    i = 0
    for s in space.sizes:
        out.append(flat[..., i:i + s])
        i += s
    return out


def sample_action(key, logits, mask, space: ActionSpace):
    """Sample the 7 factored components with invalid-action masking.

    logits/mask: [H, W, A_total] (mask includes the leading can-act bit at
    channel 0 of the env mask layout — pass mask WITHOUT that bit here).
    Returns (action [H, W, 7], logprob [H, W], entropy [H, W])."""
    lps = split_components(logits, space)
    mks = split_components(mask, space)
    keys = jax.random.split(key, 7)
    acts, lp_sum, ent_sum = [], 0.0, 0.0
    for i, (lg, mk) in enumerate(zip(lps, mks)):
        has = jnp.any(mk, axis=-1, keepdims=True)
        lg = jnp.where(mk | ~has, lg, NEG_INF)
        a = jax.random.categorical(keys[i], lg, axis=-1)
        logp = jax.nn.log_softmax(lg, axis=-1)
        p = jnp.exp(logp)
        lp_sum = lp_sum + jnp.take_along_axis(
            logp, a[..., None], axis=-1)[..., 0]
        ent_sum = ent_sum - jnp.sum(
            jnp.where(p > 0, p * logp, 0.0), axis=-1)
        acts.append(a)
    return jnp.stack(acts, axis=-1).astype(jnp.int32), lp_sum, ent_sum


def greedy_action(logits, mask, space: ActionSpace):
    """Per-component argmax with invalid-action masking (deterministic
    counterpart of sample_action, for greedy evaluation)."""
    lps = split_components(logits, space)
    mks = split_components(mask, space)
    acts = []
    for lg, mk in zip(lps, mks):
        has = jnp.any(mk, axis=-1, keepdims=True)
        lg = jnp.where(mk | ~has, lg, NEG_INF)
        acts.append(jnp.argmax(lg, axis=-1))
    return jnp.stack(acts, axis=-1).astype(jnp.int32)


def action_logprob(logits, mask, action, space: ActionSpace):
    """Log-prob + entropy of a given action under current logits."""
    lps = split_components(logits, space)
    mks = split_components(mask, space)
    lp_sum, ent_sum = 0.0, 0.0
    for i, (lg, mk) in enumerate(zip(lps, mks)):
        has = jnp.any(mk, axis=-1, keepdims=True)
        lg = jnp.where(mk | ~has, lg, NEG_INF)
        logp = jax.nn.log_softmax(lg, axis=-1)
        p = jnp.exp(logp)
        lp_sum = lp_sum + jnp.take_along_axis(
            logp, action[..., i:i + 1], axis=-1)[..., 0]
        ent_sum = ent_sum - jnp.sum(jnp.where(p > 0, p * logp, 0.0), axis=-1)
    return lp_sum, ent_sum
