"""SSVD genome <-> weights codec and learned evaluation.

Re-design of the ConnAALL fork's learned-evaluation stack
(ai/AALL/math/SSVD.java:3-36 structured-SVD chromosome decoder,
ai/AALL/evaluation/SSVDEvaluation.java:17-167 dense eval net over the
observation tensor, WeightedEvaluation): a flat genome vector decodes into
low-rank (U diag(s) V^T) weight matrices for a small evaluation MLP over
the flattened one-hot observation — compact enough for neuroevolution
(train/es.py), and usable as ``eval_fn`` inside the playout search bots
(bots/search.py), mirroring ModelledEvaluationMCTS.java:28-58.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ssvd_shapes(layer_dims: Sequence[int], rank: int) -> List[Tuple]:
    """Per-layer (U [m, r], s [r], V [n, r], b [n]) genome segmentation."""
    out = []
    for m, n in zip(layer_dims[:-1], layer_dims[1:]):
        r = min(rank, m, n)
        out.append(((m, r), (r,), (n, r), (n,)))
    return out


def genome_size(layer_dims: Sequence[int], rank: int) -> int:
    total = 0
    for (u, s, v, b) in ssvd_shapes(layer_dims, rank):
        total += int(np.prod(u) + np.prod(s) + np.prod(v) + np.prod(b))
    return total


def decode(genome: jax.Array, layer_dims: Sequence[int], rank: int):
    """Genome vector -> [(W [m, n], b [n])] with W = U diag(s) V^T
    (SSVD.java's structured-SVD chromosome layout)."""
    layers = []
    i = 0
    for (us, ss, vs, bs) in ssvd_shapes(layer_dims, rank):
        nu, ns, nv, nb = (int(np.prod(x)) for x in (us, ss, vs, bs))
        U = genome[i:i + nu].reshape(us); i += nu
        s = genome[i:i + ns]; i += ns
        V = genome[i:i + nv].reshape(vs); i += nv
        b = genome[i:i + nb]; i += nb
        layers.append(((U * s[None, :]) @ V.T, b))
    return layers


def eval_net(genome: jax.Array, obs_flat: jax.Array,
             layer_dims: Sequence[int], rank: int) -> jax.Array:
    """SSVDEvaluation.evaluateSSVD analog: tanh MLP -> scalar in (-1, 1)."""
    x = obs_flat.astype(jnp.float32)
    layers = decode(genome, layer_dims, rank)
    for i, (W, b) in enumerate(layers):
        x = x @ W + b
        x = jnp.tanh(x)
    return x[..., 0] if x.shape[-1] == 1 else jnp.tanh(jnp.sum(x, -1))


def logits_net(genome: jax.Array, x: jax.Array,
               layer_dims: Sequence[int], rank: int) -> jax.Array:
    """MLP forward returning the LAST layer's raw activations (tanh on
    hidden layers only) — the per-unit policy head of CooperativeAI
    (bots/cooperative.py), vs ``eval_net``'s scalar collapse."""
    x = x.astype(jnp.float32)
    layers = decode(genome, layer_dims, rank)
    for i, (W, b) in enumerate(layers):
        x = x @ W + b
        if i < len(layers) - 1:
            x = jnp.tanh(x)
    return x


def make_learned_eval(env, genome: jax.Array, hidden: int = 64,
                      rank: int = 8):
    """An eval_fn(state, player) for the search bots, driven by a genome
    (the WeightedEvaluation / ModelledEvaluationMCTS pattern)."""
    C = 5 + 5 + 3 + (env.cfg.engine.num_types + 1) + 6
    dims = (env.h * env.w * C, hidden, 1)

    def eval_fn(state, player):
        obs = env.observation_onehot(state, player).reshape(-1)
        return eval_net(genome, obs, dims, rank)

    return eval_fn, genome_size(dims, rank)
