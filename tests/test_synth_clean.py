"""Post-synthesis AST cleaning (synth/clean.py): the PerformCleanerAST /
PerformCleanerASTOptim analogs.

Contracts mirrored from ai/synthesis/runners/cleanAST: a cleaner may
only delete structure (never change behavior on visited states for the
behavioral cleaner / never lose fitness beyond tol for the optimizing
cleaner), dead guards and redundant wrappers are actually found, and
live commands survive.
"""

import jax
import numpy as np
import pytest

from microrts_tpu.bots.scripted import passive_bot, random_bot
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.synth.clean import (clean_program, edit_candidates,
                                      mismatch_counts, node_count,
                                      probe_states, shrink_program)
from microrts_tpu.synth.dsl import (SEED_PROGRAM, Attack, For, Harvest,
                                    Idle, If, NEnemyOfType, Train,
                                    compile_program)
from microrts_tpu.utils.assets import asset_path

@pytest.fixture(scope="module")
def env8():
    return GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))


# A guard that can never fire on basesWorkers8x8 vs a passive opponent:
# no Ranged unit ever exists without a Barracks the opponents never build.
DEAD_IF = If(NEnemyOfType("Ranged", 6, ">="), (Attack("All", "Random"),))


@pytest.mark.smoke
def test_edit_candidates_shrink_and_dedupe():
    prog = (Harvest(1), DEAD_IF, For(1, (Idle("Worker"),)),
            Attack("All", "Closest"))
    cands = edit_candidates(prog)
    assert cands
    n0 = node_count(prog)
    for label, p in cands:
        assert node_count(p) < n0, label
    assert len({p for _, p in cands}) == len(cands)


@pytest.mark.heavy
def test_clean_removes_dead_guard_keeps_live_commands(env8):
    env = env8
    prog = (Harvest(1), DEAD_IF, Train("Base", "Worker", 3),
            Attack("All", "Closest"))
    res = clean_program(env, prog, [passive_bot(env)], n_snaps=8,
                        stride=20, seed=3)
    # the dead If (and nothing load-bearing) is gone
    assert not any(isinstance(c, If) for c in res.program)
    assert any(isinstance(c, Harvest) for c in res.program)
    assert any(isinstance(c, Attack) for c in res.program)
    assert res.nodes_after < res.nodes_before
    assert res.removed
    # cleaning is behavior-preserving on fresh probes from the CLEANED
    # program (not just the probes it optimized against)
    states, seats, keys = probe_states(env, res.program,
                                       [passive_bot(env)], n_snaps=6,
                                       stride=30, seed=11)
    counts = mismatch_counts(env, prog, [res.program], states, seats, keys)
    assert counts[0] == 0


@pytest.mark.heavy
def test_clean_unwraps_for1(env8):
    env = env8
    prog = (For(1, (Harvest(1),)), Attack("All", "Closest"))
    res = clean_program(env, prog, [passive_bot(env)], n_snaps=4,
                        stride=25, seed=0)
    assert not any(isinstance(c, For) for c in res.program)
    assert any(isinstance(c, Harvest) for c in res.program)


@pytest.mark.heavy
def test_shrink_preserves_fitness(env8):
    env = env8
    prog = (DEAD_IF,) + SEED_PROGRAM
    opponents = [random_bot(env)]
    res = shrink_program(env, prog, opponents, tol=0.0,
                         games_per_pair=1, max_cycles=300, seed=5,
                         max_rounds=4)
    assert res.nodes_after <= res.nodes_before
    from microrts_tpu.synth.search import evaluate_population
    fits = evaluate_population(env, [prog, res.program], opponents,
                               games_per_pair=1, max_cycles=300, seed=9)
    assert fits[1] >= fits[0] - 1e-6
