"""Evolution strategies on device: the neuroevolution workload.

Re-design of the ConnAALL NEAT stack (ai/jneat vendored NEAT + ai/units/
CoevolutionManager + rts/MicroRTSNEAT.java:94-118 — populations evolved by
coevolution over played games).  Topology-mutating NEAT does not map to
fixed-shape accelerators; the TPU-native equivalent is antithetic OpenAI-ES
over a fixed parameterization (the SSVD genome of models/ssvd.py or any
flat-vector policy/eval), with the fitness of every population member
measured by BATCHED games in one jit — the entire generation evaluates in
a single device launch instead of one sequential game at a time.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ESConfig:
    pop_size: int = 32          # perturbation pairs (antithetic)
    sigma: float = 0.05
    lr: float = 0.02
    weight_decay: float = 0.001


class OpenES:
    """Antithetic ES: theta' = theta + lr/(n*sigma) * sum_i f_i eps_i."""

    def __init__(self, dim: int, cfg: ESConfig = ESConfig()):
        self.dim = dim
        self.cfg = cfg

    def ask(self, theta: jax.Array, key: jax.Array) -> jax.Array:
        """Population [2*pop, dim]: +eps and -eps pairs."""
        eps = jax.random.normal(key, (self.cfg.pop_size, self.dim)) \
            * self.cfg.sigma
        return jnp.concatenate([theta + eps, theta - eps], 0)

    def tell(self, theta: jax.Array, population: jax.Array,
             fitness: jax.Array) -> jax.Array:
        n = self.cfg.pop_size
        f = (fitness - fitness.mean()) / (fitness.std() + 1e-8)
        f_pos, f_neg = f[:n], f[n:]
        eps = (population[:n] - theta) / self.cfg.sigma
        grad = jnp.mean((f_pos - f_neg)[:, None] * eps, 0) \
            / (2 * self.cfg.sigma)
        return theta * (1 - self.cfg.weight_decay) \
            + self.cfg.lr * grad * self.cfg.sigma * 2


def evolve(fitness_fn: Callable, dim: int, generations: int,
           key: jax.Array, cfg: ESConfig = ESConfig(),
           theta0: Optional[jax.Array] = None, log=None
           ) -> Tuple[jax.Array, list]:
    """Generic ES loop.  ``fitness_fn(genomes [P, dim], key) -> [P]`` must
    be jittable (e.g. vmapped batched games)."""
    theta = theta0 if theta0 is not None else jnp.zeros(dim)
    es = OpenES(dim, cfg)
    fit_j = jax.jit(fitness_fn)
    history = []
    for g in range(generations):
        key, k_ask, k_fit = jax.random.split(key, 3)
        pop = es.ask(theta, k_ask)
        fit = fit_j(pop, k_fit)
        theta = es.tell(theta, pop, fit)
        history.append(float(jnp.mean(fit)))
        if log:
            log(g, history[-1], float(jnp.max(fit)))
    return theta, history


def game_fitness_fn(env, genome_bot_factory: Callable, opponent: Callable,
                    n_ticks: int = 300, reward_weight: float = 1.0):
    """Fitness = end-of-rollout material evaluation of genome-driven play
    vs a fixed opponent (the CoevolutionManager fitness pattern: game
    outcome scores the chromosome, CoevolutionManager.java:16-58)."""
    from ..ops.evaluation import simple_sqrt_eval3

    def fitness(genomes: jax.Array, key: jax.Array) -> jax.Array:
        def one(genome, k):
            bot = genome_bot_factory(genome)
            s = env.reset(k)

            def body(carry, _):
                s, kk = carry
                kk, k1, k2 = jax.random.split(kk, 3)
                s, _, _ = env.step(s, bot(s, 0, k1), opponent(s, 1, k2))
                return (s, kk), None

            (s, _), _ = jax.lax.scan(body, (s, k), None, length=n_ticks)
            return simple_sqrt_eval3(s, 0, env.cfg.engine) * reward_weight

        keys = jax.random.split(key, genomes.shape[0])
        return jax.vmap(one)(genomes, keys)

    return fitness
