"""Synthesis DSL: interpreter semantics, legality, and the search loop.

Mirrors the reference's DSL behavior contracts (ai/synthesis/
dslForScriptGenerator): commands claim units in order, If-guards gate
bodies, and the seed script plays a competent worker rush.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microrts_tpu.bots.scripted import passive_bot, random_bot
from microrts_tpu.env.gridnet import GridnetEnv
from microrts_tpu.synth.dsl import (SEED_PROGRAM, Attack, Harvest, Idle,
                                    If, NAllyOfType, Train,
                                    compile_program)
from microrts_tpu.synth.search import (evaluate_population, mutate,
                                       random_program, synthesize)
from microrts_tpu.utils.assets import asset_path


@pytest.fixture(scope="module")
def env8():
    return GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))


def _legal(env, s, a, player):
    cand = env.decode(s, a, player, env._inflight_claims(s),
                      env._inflight_spent(s, player))[0]
    legal = np.asarray(env.engine.validate(s, cand))
    real = np.asarray(cand.atype) > 0
    return legal[real].all()


def test_seed_program_plays_legally_and_wins(env8):
    env = env8
    bot = compile_program(env, SEED_PROGRAM)
    s = env.reset(jax.random.PRNGKey(0))
    assert _legal(env, s, bot(s, 0, jax.random.PRNGKey(1)), 0)
    step = jax.jit(lambda s, k: env.step(
        s, bot(s, 0, k), passive_bot(env)(s, 1, k)))
    k = jax.random.PRNGKey(2)
    for i in range(900):
        k, sub = jax.random.split(k)
        s, _, done = step(s, sub)
        if bool(done):
            break
    assert int(env.engine.winner(s)) == 0


def test_commands_claim_in_order(env8):
    """An earlier Idle command freezes the units a later Attack would
    otherwise move (the currentPlayerAction accretion contract)."""
    env = env8
    prog_idle_first = (Idle("Worker"), Attack("All", "Closest"))
    prog_attack_only = (Attack("All", "Closest"),)
    s = env.reset(jax.random.PRNGKey(3))
    k = jax.random.PRNGKey(4)
    a1 = np.asarray(compile_program(env, prog_idle_first)(s, 0, k))
    a2 = np.asarray(compile_program(env, prog_attack_only)(s, 0, k))
    workers = (np.asarray(s.utype) == env.cfg.worker_id + 1) \
        & (np.asarray(s.owner) == 0)
    assert (a1[workers][:, 0] == 0).all(), "claimed workers must idle"
    assert (a2[workers][:, 0] != 0).any(), "unclaimed workers act"


def test_if_guard_gates_body(env8):
    """If(NAllyOfType(Worker, >= 99)) can never fire at reset."""
    env = env8
    prog = (If(NAllyOfType("Worker", 99), (Attack("All", "Closest"),)),)
    s = env.reset(jax.random.PRNGKey(5))
    a = np.asarray(compile_program(env, prog)(s, 0, jax.random.PRNGKey(6)))
    assert (a == 0).all()
    prog2 = (If(NAllyOfType("Worker", 1), (Attack("All", "Closest"),)),)
    a2 = np.asarray(compile_program(env, prog2)(
        s, 0, jax.random.PRNGKey(6)))
    assert (a2 != 0).any()


def test_random_programs_compile_and_are_legal(env8):
    import random as pyrandom
    env = env8
    rng = pyrandom.Random(7)
    s = env.reset(jax.random.PRNGKey(8))
    for i in range(3):
        prog = random_program(rng)
        prog = mutate(prog, rng)
        bot = compile_program(env, prog)
        a = bot(s, 0, jax.random.PRNGKey(9 + i))
        assert _legal(env, s, a, 0), prog


def test_widened_grammar_atoms_legal(env8):
    """Every round-4 grammar atom (move-to/cluster commands, the extended
    target policies, the full boolean set) compiles and emits only legal
    actions at reset (ai/synthesis parity: MoveToCoordinatesBasic,
    MoveToUnitBasic, ClusterBasic, HaveQtd*/Have*Range/DistanceFromEnemy/
    HaveUnitsStrongest/IsPlayerInPosition + ConditionalBiggerThen ops)."""
    from microrts_tpu.synth.dsl import (AllyInEnemyRange, Cluster,
                                        DistanceFromEnemy,
                                        EnemyInUnitsRange,
                                        IsPlayerInPosition, MoveToCoord,
                                        MoveToUnit, NAllyAttacking,
                                        NAllyHarvesting, NEnemyOfType,
                                        UnitsStrongest)

    env = env8
    s = env.reset(jax.random.PRNGKey(0))
    progs = [
        (MoveToCoord(7, 7, "All"),),
        (MoveToUnit("All", "Weakest", "Enemy"),),
        (MoveToUnit("Worker", "Random", "Ally"),),
        (Cluster("All"),),
        (Attack("All", "Farthest"),),
        (Attack("All", "Random"),),
        (If(NEnemyOfType("Worker", 1), (Attack("All", "LessHealthy"),)),),
        (If(NAllyAttacking(1, "<="), (Harvest(2),)),),
        (If(NAllyHarvesting(0, "=="), (Train("Base", "Worker", 3),)),),
        (If(AllyInEnemyRange(), (Cluster("All"),)),
         Attack("All", "Closest")),
        (If(EnemyInUnitsRange(), (Attack("All", "Strongest"),)),
         Harvest(1)),
        (If(DistanceFromEnemy(6, "<="), (MoveToCoord(0, 0),)),
         Harvest(1)),
        (If(UnitsStrongest("Ally"), (Attack("All", "Closest"),)),
         Harvest(1)),
        (If(IsPlayerInPosition(0), (Harvest(2),)),
         Attack("All", "Closest")),
    ]
    for i, prog in enumerate(progs):
        a = compile_program(env, prog)(s, 0, jax.random.PRNGKey(i))
        assert _legal(env, s, np.asarray(a), 0), prog


def test_move_family_never_claims_buildings(env8):
    """A MoveToCoord('All') leaves bases unclaimed so a later Train can
    still use them (Java: findPath fails for immobile units and the loop
    assigns nothing)."""
    from microrts_tpu.synth.dsl import MoveToCoord

    env = env8
    prog = (MoveToCoord(7, 7, "All"), Train("Base", "Worker", 5))
    s = env.reset(jax.random.PRNGKey(1))
    a = np.asarray(compile_program(env, prog)(s, 0, jax.random.PRNGKey(2)))
    bases = (np.asarray(s.utype) == env.cfg.base_id + 1) \
        & (np.asarray(s.owner) == 0)
    assert (a[bases][:, 0] == 4).all(), "base should still PRODUCE"


@pytest.mark.heavy
def test_synthesis_improves_or_holds_fitness(env8):
    env = env8
    opponents = [random_bot(env, 5.0)]
    res = synthesize(env, opponents, generations=2, population=2,
                     games_per_pair=1, max_cycles=200, seed=11)
    assert 0.0 <= res.fitness <= 1.0
    # monotone best-so-far by construction
    fs = [f for _, f in res.history]
    assert fs == sorted(fs)


def test_move_to_closest_ally_actually_moves(env8):
    """MoveToUnit(Ally, Closest) routes each unit toward the nearest
    OTHER ally (MoveToUnitBasic) — the mover's own cell is ally-distance
    0 and must not freeze it (advisor r4 medium finding)."""
    from microrts_tpu.synth.dsl import MoveToUnit

    env = env8
    s = env.reset(jax.random.PRNGKey(3))
    # find p0's worker and relocate it to (4,4): now ~5 path steps from
    # its base, so "closest other ally" routing must produce a MOVE
    # (at reset it is adjacent to the base — correctly no move)
    wmask = (np.asarray(s.utype) == env.cfg.worker_id + 1) \
        & (np.asarray(s.owner) == 0)
    src = tuple(int(v[0]) for v in np.nonzero(wmask))

    def move_unit(pl, dst, fill=0):
        pl = np.asarray(pl).copy()
        pl[dst] = pl[src]
        pl[src] = fill
        return jnp.asarray(pl)

    s = s.replace(
        utype=move_unit(s.utype, (4, 4)),
        owner=move_unit(s.owner, (4, 4), fill=-1),
        hp=move_unit(s.hp, (4, 4)),
        uid=move_unit(s.uid, (4, 4))).canon()
    prog = (MoveToUnit("Worker", "Closest", "Ally"),)
    a = np.asarray(compile_program(env, prog)(s, 0, jax.random.PRNGKey(4)))
    assert a[4, 4, 0] == 1, \
        "worker should walk toward its base (the closest other ally)"
    assert a[4, 4, 1] in (0, 3), "step up or left, toward (1,1)"


def test_distance_field2_two_nearest_distinct():
    from microrts_tpu.ops.fields import distance_field2

    H = W = 6
    src = np.zeros((H, W), bool)
    src[0, 0] = src[0, 3] = src[5, 5] = True
    passable = np.ones((H, W), bool)
    d1, i1, d2, i2 = [np.asarray(x) for x in distance_field2(
        jnp.asarray(src), jnp.asarray(passable), H + W)]
    # at source (0,0): first entry is itself, second is (0,3) at dist 3
    assert d1[0, 0] == 0 and i1[0, 0] == 0
    assert d2[0, 0] == 3 and i2[0, 0] == 3
    # at (0,2): nearest is (0,3) d=1, second-nearest distinct is (0,0) d=2
    assert d1[0, 2] == 1 and i1[0, 2] == 3
    assert d2[0, 2] == 2 and i2[0, 2] == 0
    # invariants everywhere: d1 <= d2, ids distinct where both exist
    assert (d1 <= d2).all()
    both = (i1 >= 0) & (i2 >= 0)
    assert (i1[both] != i2[both]).all()


def test_program_export_roundtrip(env8):
    """dumps/loads/to_module round-trip (the ProgramScript artifact
    layer of ai/synthesis/grammar/model): the reloaded program is
    structurally identical and the exported module compiles to a bot
    producing the same actions."""
    import os
    import tempfile

    from microrts_tpu.synth import export as ex
    from microrts_tpu.synth.dsl import SEED_PROGRAM, If, Idle, \
        NAllyOfType

    env = env8
    prog = SEED_PROGRAM + (If(NAllyOfType("Worker", 3, ">="),
                              (Idle("Worker"),)),)
    assert ex.loads(ex.dumps(prog)) == prog
    # file round-trip
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "prog.txt")
        ex.save_program(prog, p)
        assert ex.load_program(p) == prog
        # module export: write, import, build, compare actions
        mp = os.path.join(d, "synthmod.py")
        with open(mp, "w") as f:
            f.write(ex.to_module(prog, "test"))
        import importlib.util
        spec = importlib.util.spec_from_file_location("synthmod", mp)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert mod.PROGRAM == prog
        s = env.reset(jax.random.PRNGKey(11))
        k = jax.random.PRNGKey(12)
        a1 = np.asarray(mod.make(env)(s, 0, k))
        a2 = np.asarray(compile_program(env, prog)(s, 0, k))
        np.testing.assert_array_equal(a1, a2)
    # the no-builtins namespace rejects smuggled code
    import pytest as _pytest
    with _pytest.raises(Exception):
        ex.loads("__import__('os').system('true')")
