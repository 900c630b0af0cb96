"""Program synthesis: search the DSL grammar for strong scripts.

TPU re-design of ai/synthesis/grammar + runners (SURVEY.md §2.3): the
reference samples/mutates DSL trees (BuilderDSLTreeSingleton,
ReduceDSLController) and evaluates candidates by playing games
(DSL_RunBattle.java).  Here a GENERATION of candidate programs is
evaluated as ONE batched device tournament: every (candidate, opponent,
seed) triple is a vmapped lane dispatching its candidate via
``lax.switch`` — the evaluation cost of a whole population is one XLA
launch, which is the TPU-native reason synthesis is practical at all.

Search = (1+λ) hill-climbing over the grammar with structural mutations
(replace a command, resize a parameter, wrap/unwrap an If) — the same
neighborhood the reference's tree mutations induce; fitness = mean game
outcome (win = 1, draw = ½) against the opponent pool.
"""

from __future__ import annotations

import dataclasses
import random
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..env.gridnet import GridnetEnv
from .dsl import (AllyInEnemyRange, Attack, Build, Cluster, Cond,
                  DistanceFromEnemy, EnemyInRange, EnemyInUnitsRange, For,
                  Harvest, Idle, If, IsPlayerInPosition, MoveAway,
                  MoveToCoord, MoveToUnit, NAllyAttacking,
                  NAllyHarvesting, NAllyOfType, NEnemyOfType, Program,
                  Train, UnitsStrongest, compile_program)

UNIT_TYPES = ("Worker", "Light", "Heavy", "Ranged")
TARGETS = ("Closest", "Farthest", "Weakest", "LessHealthy", "Strongest",
           "MostHealthy", "Random")
OPS = (">=", "<=", ">")


def random_command(rng: random.Random, depth: int = 0, hw=(8, 8)):
    kinds = ["train", "build", "harvest", "attack", "moveaway", "idle",
             "movecoord", "moveunit", "cluster"]
    if depth == 0:
        kinds += ["if"] * 3
    k = rng.choice(kinds)
    if k == "train":
        unit = rng.choice(UNIT_TYPES)
        prod = "Base" if unit == "Worker" else "Barracks"
        return Train(prod, unit, rng.randint(1, 20))
    if k == "build":
        return Build("Barracks", rng.randint(1, 2))
    if k == "harvest":
        return Harvest(rng.randint(1, 3))
    if k == "attack":
        return Attack(rng.choice(("All",) + UNIT_TYPES),
                      rng.choice(TARGETS))
    if k == "moveaway":
        return MoveAway(rng.choice(("All",) + UNIT_TYPES))
    if k == "idle":
        return Idle(rng.choice(("All",) + UNIT_TYPES))
    if k == "movecoord":
        return MoveToCoord(rng.randrange(hw[1]), rng.randrange(hw[0]),
                           rng.choice(("All",) + UNIT_TYPES))
    if k == "moveunit":
        return MoveToUnit(rng.choice(("All",) + UNIT_TYPES),
                          rng.choice(TARGETS),
                          rng.choice(("Enemy", "Ally")))
    if k == "cluster":
        return Cluster(rng.choice(("All",) + UNIT_TYPES))
    cond = random_cond(rng)
    body = tuple(random_command(rng, depth + 1, hw)
                 for _ in range(rng.randint(1, 2)))
    return If(cond, body)


def random_cond(rng: random.Random) -> Cond:
    draws = (
        lambda: NAllyOfType(rng.choice(UNIT_TYPES), rng.randint(1, 6),
                            rng.choice(OPS)),
        lambda: NEnemyOfType(rng.choice(UNIT_TYPES), rng.randint(1, 6),
                             rng.choice(OPS)),
        lambda: NAllyAttacking(rng.randint(1, 4), rng.choice(OPS)),
        lambda: NAllyHarvesting(rng.randint(1, 3), rng.choice(OPS)),
        lambda: EnemyInRange(rng.randint(2, 10)),
        lambda: AllyInEnemyRange(),
        lambda: EnemyInUnitsRange(),
        lambda: DistanceFromEnemy(rng.randint(2, 12),
                                  rng.choice(("<=", ">"))),
        lambda: UnitsStrongest(rng.choice(("Ally", "Enemy"))),
        lambda: IsPlayerInPosition(rng.randrange(4)),
    )
    return rng.choice(draws)()


def random_program(rng: random.Random, n_cmds: int = 4) -> Program:
    prog = tuple(random_command(rng) for _ in range(n_cmds))
    # always end with a default attack so no unit pool deadlocks
    return prog + (Attack("All", "Closest"),)


def mutate(prog: Program, rng: random.Random) -> Program:
    cmds = list(prog)
    op = rng.choice(["replace", "insert", "delete", "swap"])
    if op == "replace" or not cmds:
        i = rng.randrange(len(cmds)) if cmds else 0
        cmds[i:i + 1] = [random_command(rng)]
    elif op == "insert" and len(cmds) < 8:
        cmds.insert(rng.randrange(len(cmds) + 1), random_command(rng))
    elif op == "delete" and len(cmds) > 2:
        del cmds[rng.randrange(len(cmds) - 1)]   # keep the tail attack
    elif op == "swap" and len(cmds) > 2:
        i, j = rng.sample(range(len(cmds) - 1), 2)
        cmds[i], cmds[j] = cmds[j], cmds[i]
    return tuple(cmds)


def evaluate_population(env: GridnetEnv, programs: Sequence[Program],
                        opponents: Sequence[Callable],
                        games_per_pair: int = 2, max_cycles: int = 1200,
                        seed: int = 0) -> np.ndarray:
    """Fitness per program: ONE compiled batched run over every
    (program, opponent, repeat, side) lane (the DSL_RunBattle analog,
    vectorized).  Returns f32 [len(programs)] mean scores in [0, 1]."""
    bots = [compile_program(env, p) for p in programs]
    P, O = len(bots), len(opponents)
    cand_b = [(lambda b: lambda s, p, k: b(s, p, k))(b) for b in bots]
    opp_b = [(lambda b: lambda s, p, k: b(s, p, k))(b) for b in opponents]

    def one_game(pi, oi, side, key):
        s = env.reset(key)

        def body(carry, _):
            s, done, winner, k = carry
            k, k0, k1 = jax.random.split(k, 3)
            ac = jax.lax.switch(pi, cand_b, s, side, k0)
            ao = jax.lax.switch(oi, opp_b, s, 1 - side, k1)
            a0 = jnp.where(side == 0, ac, ao)
            a1 = jnp.where(side == 0, ao, ac)
            s2, _, d2 = env.step(s, a0, a1)
            s3 = jax.tree.map(lambda a, b: jnp.where(done, a, b), s, s2)
            winner = jnp.where(done, winner,
                               jnp.where(d2, env.engine.winner(s2), -1))
            return (s3, done | d2, winner, k), None

        (s, done, winner, _), _ = jax.lax.scan(
            body, (s, jnp.asarray(False), jnp.int32(-1), key), None,
            length=max_cycles)
        return jnp.where(winner == side, 1.0,
                         jnp.where(winner == 1 - side, 0.0, 0.5))

    lanes = [(pi, oi, side, g)
             for pi in range(P) for oi in range(O)
             for side in (0, 1) for g in range(games_per_pair)]
    pis = jnp.asarray([l[0] for l in lanes], jnp.int32)
    ois = jnp.asarray([l[1] for l in lanes], jnp.int32)
    sides = jnp.asarray([l[2] for l in lanes], jnp.int32)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(seed), jnp.arange(len(lanes), dtype=jnp.uint32))
    scores = np.asarray(jax.jit(jax.vmap(one_game))(pis, ois, sides, keys))
    out = np.zeros(P)
    for l, sc in zip(lanes, scores):
        out[l[0]] += sc
    return out / (O * 2 * games_per_pair)


@dataclasses.dataclass
class SynthesisResult:
    program: Program
    fitness: float
    history: List[Tuple[int, float]]


def synthesize(env: GridnetEnv, opponents: Sequence[Callable],
               generations: int = 8, population: int = 4,
               games_per_pair: int = 2, max_cycles: int = 1200,
               seed: int = 0,
               seed_program: Optional[Program] = None) -> SynthesisResult:
    """(1+λ) hill-climbing: each generation evaluates the incumbent plus
    ``population-1`` mutations in one batched tournament and keeps the
    best (the runners' synthesize-evaluate loop, device-batched)."""
    rng = random.Random(seed)
    from .dsl import SEED_PROGRAM
    best = seed_program or SEED_PROGRAM
    best_f = -1.0
    history: List[Tuple[int, float]] = []
    for g in range(generations):
        cands = [best] + [mutate(best, rng)
                          for _ in range(population - 1)]
        fits = evaluate_population(env, cands, opponents,
                                   games_per_pair, max_cycles,
                                   seed=seed + g)
        i = int(np.argmax(fits))
        if fits[i] >= best_f:
            best, best_f = cands[i], float(fits[i])
        history.append((g, best_f))
    return SynthesisResult(best, best_f, history)
