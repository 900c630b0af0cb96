"""The script-synthesis DSL: programmatic strategies as dense rule stacks.

TPU re-design of ai/synthesis/ (SURVEY.md §2.3; the "programmatic
strategies" line — DslAIScript.java, DSLCommand/DSLBasicAction/*.java,
grammar/dslTree/*):  a PROGRAM is an ordered list of commands; each
command claims the player's still-unassigned units matching its filter
and gives them a micro action (AttackBasic.getAction:36-80's
"getPotentialUnits → skip already-assigned → addUnitAction" loop), with
``if`` (boolean feature guards, DSLBasicBoolean/*) and ``for`` (static
repetition) combinators.

Dense execution model: one pass over the command list threading
``(out, claimed)`` planes — a command writes cells it claims and later
commands see them as taken, exactly the currentPlayerAction accretion of
the reference — so a compiled program is straight-line tensor algebra:
it jits, vmaps over envs, and batches into tournaments.  ``If`` guards
multiply the claim mask by a traced scalar (both sides of the branch are
data-independent), keeping programs compilable regardless of structure.

Command set (matched to DSLCommand/DSLBasicAction):

* ``Train(producer, unit, qty)``   — TrainBasic.java
* ``Build(building, qty)``         — BuildBasic.java (worker builds)
* ``Harvest(qty)``                 — HarvestBasic.java (harvest loop)
* ``Attack(filter, target)``       — AttackBasic.java; target policies
  Closest / Farthest / Weakest / LessHealthy / Strongest / MostHealthy /
  Random mirror {ClosestEnemy,FarthestEnemy,WeakestEnemy,
  LessHealthyEnemy,StrongestEnemy,MostHealthyEnemy,RandomEnemy}.java
* ``MoveAway(filter)``             — MoveAwayBasic.java
* ``MoveToCoord(x, y, filter)``    — MoveToCoordinatesBasic.java
* ``MoveToUnit(filter, target, side)`` — MoveToUnitBasic.java
  (side = Ally | Enemy, EnumPlayerTarget)
* ``Cluster(filter)``              — ClusterBasic.java (centroid walk)
* ``Idle(filter)``                 — keep units home (defense atom)
* ``If(cond, then)``               — IfFunction.java
* ``For(n, body)``                 — ForFunction.java (static unroll)

Conditions (DSLBasicBoolean / AbstractConditionalFunction, with the
ConditionalBiggerThen-style comparison ops): ``NAllyOfType`` /
``NEnemyOfType`` / ``NAllyAttacking`` / ``NAllyHarvesting`` (unit-count
comparisons), ``EnemyInRange(r)`` (enemy within r of any own base),
``AllyInEnemyRange`` / ``EnemyInUnitsRange`` (attack-range overlap),
``DistanceFromEnemy(d, op)``, ``UnitsStrongest(side)`` (hp-mass
comparison), ``IsPlayerInPosition(quadrant)``, ``CanAfford(type)``.

Documented divergences:

* ``MoveToUnit`` non-Closest targets pick ONE board-global target
  (argmax of the score over the side mask) shared by every claimed
  unit, where the reference's DSLParametersConcrete policies are
  per-unit; and "Farthest" scores path distance from the own-unit
  set rather than from each acting unit.  (Closest is exact: enemy
  side descends the enemy field, ally side routes to the nearest
  OTHER ally via the two-source field — MoveToUnitBasic.)
* ``MoveToUnit`` claims only units that received a MOVE; a pathless
  unit stays available to later commands (Java's loop assigns
  nothing when findPath fails).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple, Union

import jax
import jax.numpy as jnp

from ..engine import kernel as K
from ..engine.kernel import make_lookup
from ..engine.types import ATTACK, HARVEST, MOVE, PRODUCE, RETURN, State
from ..env.gridnet import GridnetEnv
from ..ops.fields import (descend_direction, descend_direction_excluding,
                          distance_field, distance_field2)
from ..bots.scripted import _rank_by_uid

# ---- program AST (hashable frozen dataclasses — a program is a static
# structure folded into the compiled bot) --------------------------------


@dataclasses.dataclass(frozen=True)
class Train:
    producer: str          # "Base" | "Barracks"
    unit: str              # type name to train
    qty: int               # stop once this many own units of ``unit``


@dataclasses.dataclass(frozen=True)
class Build:
    building: str          # "Barracks" | "Base"
    qty: int


@dataclasses.dataclass(frozen=True)
class Harvest:
    qty: int               # number of dedicated harvesters


@dataclasses.dataclass(frozen=True)
class Attack:
    filter: str = "All"    # "All" or a type name
    target: str = "Closest"  # Closest | Weakest | Strongest | MostHealthy


@dataclasses.dataclass(frozen=True)
class MoveAway:
    filter: str = "All"


@dataclasses.dataclass(frozen=True)
class Idle:
    filter: str = "All"


@dataclasses.dataclass(frozen=True)
class MoveToCoord:
    """MoveToCoordinatesBasic.java: claimed units path toward a fixed
    board coordinate."""
    x: int
    y: int
    filter: str = "All"


@dataclasses.dataclass(frozen=True)
class MoveToUnit:
    """MoveToUnitBasic.java: claimed units move toward a unit chosen by
    the target policy on ``side`` ("Enemy" | "Ally" — EnumPlayerTarget),
    without attacking."""
    filter: str = "All"
    target: str = "Closest"
    side: str = "Enemy"


@dataclasses.dataclass(frozen=True)
class Cluster:
    """ClusterBasic.java: claimed units walk toward their own centroid
    (CalcCentroide + findPath to the centroid cell)."""
    filter: str = "All"


# ---- boolean atoms (DSLBasicBoolean / AbstractConditionalFunction);
# ``op`` in {">=", "<=", "==", ">", "<"} (ConditionalBiggerThen et al.)

@dataclasses.dataclass(frozen=True)
class NAllyOfType:
    """HaveQtdUnitsbyType / NAllyUnitsofType."""
    unit: str
    k: int
    op: str = ">="


@dataclasses.dataclass(frozen=True)
class NEnemyOfType:
    """HaveQtdEnemiesbyType / NEnemyUnitsofType."""
    unit: str
    k: int
    op: str = ">="


@dataclasses.dataclass(frozen=True)
class NAllyAttacking:
    """HaveQtdUnitsAttacking / NAllyUnitsAttacking: own units whose
    in-flight action is ATTACK."""
    k: int
    op: str = ">="


@dataclasses.dataclass(frozen=True)
class NAllyHarvesting:
    """HaveQtdUnitsHarversting / NAllyUnitsHarvesting: own units whose
    in-flight action is HARVEST."""
    k: int
    op: str = ">="


@dataclasses.dataclass(frozen=True)
class EnemyInRange:
    r: int                 # true iff an enemy is within r of an own base


@dataclasses.dataclass(frozen=True)
class AllyInEnemyRange:
    """HaveUnitsinEnemyRange: some own unit stands inside an enemy's
    attack range."""


@dataclasses.dataclass(frozen=True)
class EnemyInUnitsRange:
    """HaveEnemiesinUnitsRange: some enemy stands inside an own unit's
    attack range."""


@dataclasses.dataclass(frozen=True)
class DistanceFromEnemy:
    """DistanceFromEnemy.java: the closest own-unit-to-enemy distance
    (4-neighbor grid distance, walls ignored) compares ``op`` ``d``."""
    d: int
    op: str = "<="


@dataclasses.dataclass(frozen=True)
class UnitsStrongest:
    """HaveUnitsStrongest / HaveEnemiesStrongest: ``side`` ("Ally" |
    "Enemy") has the strictly larger total hit-point mass."""
    side: str = "Ally"


@dataclasses.dataclass(frozen=True)
class IsPlayerInPosition:
    """IsPlayerInPosition.java: an own base sits in board quadrant
    ``quadrant`` (0=NW, 1=NE, 2=SW, 3=SE — getLimitOfPosition)."""
    quadrant: int


@dataclasses.dataclass(frozen=True)
class CanAfford:
    unit: str


Cond = Union[NAllyOfType, NEnemyOfType, NAllyAttacking, NAllyHarvesting,
             EnemyInRange, AllyInEnemyRange, EnemyInUnitsRange,
             DistanceFromEnemy, UnitsStrongest, IsPlayerInPosition,
             CanAfford]


@dataclasses.dataclass(frozen=True)
class If:
    cond: Cond
    then: Tuple["Command", ...]


@dataclasses.dataclass(frozen=True)
class For:
    n: int
    body: Tuple["Command", ...]


Command = Union[Train, Build, Harvest, Attack, MoveAway, Idle,
                MoveToCoord, MoveToUnit, Cluster, If, For]
Program = Tuple[Command, ...]


# ---- interpreter -------------------------------------------------------

def compile_program(env: GridnetEnv, program: Program):
    """Compile a DSL program into a bot(state, player, key) -> [H, W, 7].

    The reference interprets command objects per call (DslAIScript);
    here the program structure is STATIC, so interpretation happens at
    trace time and the bot is a fused tensor computation.
    """
    cfg = env.cfg
    ecfg = cfg.engine
    H, W, T = env.h, env.w, ecfg.num_types
    R = ecfg.max_range
    D = 2 * R + 1
    COST = list(ecfg.cost)
    lk_atk = make_lookup(ecfg.can_attack, bool)
    lk_move = make_lookup(ecfg.can_move, bool)
    lk_harv = make_lookup(ecfg.can_harvest, bool)
    lk_res = make_lookup(ecfg.is_resource, bool)
    lk_stock = make_lookup(ecfg.is_stockpile, bool)
    lk_range = make_lookup(ecfg.attack_range)
    type_id = {}
    for tname in ("Worker", "Light", "Heavy", "Ranged", "Base",
                  "Barracks"):
        tid = getattr(cfg, f"{tname.lower()}_id", -1)
        if tid >= 0:
            type_id[tname] = tid
    iters = H + W

    def bot(state: State, player, key):
        me = jnp.int32(player)
        t = jnp.clip(state.utype - 1, 0, T - 1)
        exists = state.utype > 0
        mine = exists & (state.owner == me)
        idle = mine & ~state.busy
        enemy = exists & (state.owner >= 0) & (state.owner != me)
        resource = exists & lk_res(t)
        my_base = mine & lk_stock(t)
        passable = (state.terrain == 0) & ~exists
        free_n = jnp.stack([K.pull(passable, d, fill=False)
                            for d in range(4)], -1)
        tdir = jnp.argmax(free_n, -1).astype(jnp.int32)
        d_enemy = distance_field(enemy, passable, iters)
        d_res = distance_field(resource, passable, iters)
        d_base = distance_field(my_base, passable, iters)
        balance = jnp.where(me == 1, state.resources[1],
                            state.resources[0])
        worker = mine & lk_harv(t)
        uid_rank = _rank(worker, state.uid)
        rng_plane = lk_range(t)
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        dmg_plane = make_lookup(ecfg.max_damage)(t)

        def walk_to(src_mask):
            """Greedy descend direction toward a (traced) source mask."""
            return descend_direction(
                distance_field(src_mask, passable, iters), free_n)

        def count_of(tname):
            tid = type_id.get(tname, -1)
            if tid < 0:
                return jnp.int32(0)
            return jnp.sum(mine & (t == tid)).astype(jnp.int32)

        def filt(fname):
            if fname == "All":
                return jnp.ones((H, W), bool)
            tid = type_id.get(fname, -1)
            if tid < 0:
                return jnp.zeros((H, W), bool)
            return t == tid

        def _cmp(a, op, b):
            return {">=": a >= b, "<=": a <= b, "==": a == b,
                    ">": a > b, "<": a < b}[op]

        def _range_cover(src_mask):
            """Cells within attack range of some unit in ``src_mask``
            (squared-Euclidean ranges, Unit.java:424-435)."""
            cover = jnp.zeros((H, W), bool)
            for dy in range(-R, R + 1):
                for dx in range(-R, R + 1):
                    d2 = dx * dx + dy * dy
                    if d2 == 0:
                        continue
                    cover = cover | K._shift(
                        src_mask & (rng_plane * rng_plane >= d2),
                        dx, dy, fill=False)
            return cover

        def cond_value(c) -> jax.Array:
            if isinstance(c, NAllyOfType):
                return _cmp(count_of(c.unit), c.op, c.k)
            if isinstance(c, NEnemyOfType):
                tid = type_id.get(c.unit, -1)
                n = jnp.sum(enemy & (t == tid)).astype(jnp.int32) \
                    if tid >= 0 else jnp.int32(0)
                return _cmp(n, c.op, c.k)
            if isinstance(c, NAllyAttacking):
                n = jnp.sum(mine & state.busy
                            & (state.atype == ATTACK)).astype(jnp.int32)
                return _cmp(n, c.op, c.k)
            if isinstance(c, NAllyHarvesting):
                n = jnp.sum(mine & state.busy
                            & (state.atype == HARVEST)).astype(jnp.int32)
                return _cmp(n, c.op, c.k)
            if isinstance(c, EnemyInRange):
                # enemy within r (path distance) of an own base
                near = (d_base <= c.r) & enemy
                return jnp.any(near)
            if isinstance(c, AllyInEnemyRange):
                return jnp.any(mine & _range_cover(enemy))
            if isinstance(c, EnemyInUnitsRange):
                return jnp.any(enemy & _range_cover(mine & lk_atk(t)))
            if isinstance(c, DistanceFromEnemy):
                free = jnp.ones((H, W), bool)
                d_free = distance_field(enemy, free, iters)
                dmin = jnp.min(jnp.where(mine, d_free, H * W))
                return _cmp(dmin, c.op, c.d)
            if isinstance(c, UnitsStrongest):
                own_hp = jnp.sum(jnp.where(mine, state.hp, 0))
                foe_hp = jnp.sum(jnp.where(enemy, state.hp, 0))
                return (own_hp > foe_hp) if c.side == "Ally" \
                    else (foe_hp > own_hp)
            if isinstance(c, IsPlayerInPosition):
                xs_ = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
                ys_ = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
                east = xs_ >= (W + 1) // 2
                south = ys_ >= (H + 1) // 2
                quad = {0: ~east & ~south, 1: east & ~south,
                        2: ~east & south, 3: east & south}[c.quadrant]
                return jnp.any(my_base & quad)
            if isinstance(c, CanAfford):
                tid = type_id.get(c.unit, -1)
                if tid < 0:
                    return jnp.bool_(False)
                return balance >= COST[tid]
            raise TypeError(c)

        def nearest_in_range_target(score_fn):
            """rel-window index of the chosen in-range enemy per cell;
            found mask.  ``score_fn(hp, dmg) -> f32`` picks among in-range
            enemies (higher wins; ties to the nearer scan position)."""
            best_rel = jnp.zeros((H, W), jnp.int32)
            best_s = jnp.full((H, W), -jnp.inf)
            offs = sorted(((dx * dx + dy * dy, dx, dy)
                           for dy in range(-R, R + 1)
                           for dx in range(-R, R + 1)), key=lambda z: z[0])
            lk_hp = state.hp
            lk_dmg = make_lookup(ecfg.max_damage)(t)
            for d2, dx, dy in offs:
                if d2 == 0:
                    continue
                e_at = K._shift(enemy, -dx, -dy, fill=False) \
                    & (d2 <= rng_plane * rng_plane)
                hp_at = K._shift(lk_hp, -dx, -dy, fill=0)
                dmg_at = K._shift(lk_dmg, -dx, -dy, fill=0)
                rel = (R + dy) * D + (R + dx)
                s = score_fn(hp_at.astype(jnp.float32),
                             dmg_at.astype(jnp.float32),
                             jnp.float32(d2), rel)
                take = e_at & (s > best_s)
                best_rel = jnp.where(take, rel, best_rel)
                best_s = jnp.where(take, s, best_s)
            return best_rel, jnp.isfinite(best_s)

        # per-unit in-range target policies (DSLParametersConcrete/*.java;
        # scan order is ascending d2, so a constant score ties to Closest)
        TARGETS = {
            "Closest": lambda hp, dmg, d2, rel: jnp.zeros_like(hp),
            "Farthest": lambda hp, dmg, d2, rel: jnp.full_like(hp, d2),
            "Weakest": lambda hp, dmg, d2, rel: -hp,
            "LessHealthy": lambda hp, dmg, d2, rel: -hp,
            "MostHealthy": lambda hp, dmg, d2, rel: hp,
            "Strongest": lambda hp, dmg, d2, rel: dmg,
            "Random": lambda hp, dmg, d2, rel: jax.random.uniform(
                jax.random.fold_in(key, rel), hp.shape),
        }

        def run(cmds, out, claimed, gate):
            for cmd in cmds:
                if isinstance(cmd, If):
                    out, claimed = run(cmd.then, out, claimed,
                                       gate & cond_value(cmd.cond))
                elif isinstance(cmd, For):
                    for _ in range(cmd.n):
                        out, claimed = run(cmd.body, out, claimed, gate)
                elif isinstance(cmd, Train):
                    pid = type_id.get(cmd.producer, -1)
                    uid_t = type_id.get(cmd.unit, -1)
                    if pid < 0 or uid_t < 0:
                        continue
                    ok = (idle & ~claimed & (t == pid) & gate
                          & (count_of(cmd.unit) < cmd.qty)
                          & (balance >= COST[uid_t])
                          & jnp.any(free_n, -1))
                    out = _put(out, ok, PRODUCE, p4=tdir, p5=uid_t)
                    claimed = claimed | ok
                elif isinstance(cmd, Build):
                    bid = type_id.get(cmd.building, -1)
                    if bid < 0:
                        continue
                    builder = (idle & ~claimed & worker & gate
                               & (count_of(cmd.building) < cmd.qty)
                               & (balance >= COST[bid])
                               & jnp.any(free_n, -1))
                    # only the lowest-uid eligible worker builds
                    first = _first(builder, state.uid)
                    out = _put(out, first, PRODUCE, p4=tdir, p5=bid)
                    claimed = claimed | first
                elif isinstance(cmd, Harvest):
                    hu = idle & ~claimed & worker & gate \
                        & (uid_rank < cmd.qty)
                    adj_res = jnp.stack([K.pull(resource, d, fill=False)
                                         for d in range(4)], -1)
                    adj_base = jnp.stack([K.pull(my_base, d, fill=False)
                                          for d in range(4)], -1)
                    carrying = state.carried > 0
                    h_here = hu & ~carrying & jnp.any(adj_res, -1)
                    hdir = jnp.argmax(adj_res, -1).astype(jnp.int32)
                    out = _put(out, h_here, HARVEST, p2=hdir)
                    r_here = hu & carrying & jnp.any(adj_base, -1)
                    rdir = jnp.argmax(adj_base, -1).astype(jnp.int32)
                    out = _put(out, r_here, RETURN, p3=rdir)
                    m_res = descend_direction(d_res, free_n)
                    m_base = descend_direction(d_base, free_n)
                    w_res = hu & ~carrying & ~h_here & (m_res >= 0)
                    w_base = hu & carrying & ~r_here & (m_base >= 0)
                    out = _put(out, w_res, MOVE, p1=m_res)
                    out = _put(out, w_base, MOVE, p1=m_base)
                    claimed = claimed | hu
                elif isinstance(cmd, Attack):
                    unit_ok = (idle & ~claimed & mine & lk_atk(t)
                               & filt(cmd.filter) & gate)
                    rel, found = nearest_in_range_target(
                        TARGETS[cmd.target])
                    shoot = unit_ok & found
                    out = _put(out, shoot, ATTACK, p6=rel)
                    mdir = descend_direction(d_enemy, free_n)
                    walk = unit_ok & ~shoot & (mdir >= 0)
                    out = _put(out, walk, MOVE, p1=mdir)
                    claimed = claimed | unit_ok
                elif isinstance(cmd, MoveAway):
                    # move-family commands only ever claim MOBILE units
                    # (the Java loop assigns nothing when findPath fails
                    # for an immobile unit, so it stays unclaimed)
                    unit_ok = (idle & ~claimed & mine & filt(cmd.filter)
                               & lk_move(t) & gate)
                    # ascend the enemy distance field; a unit's own cell
                    # is occupied (INF) so its value = 1 + min neighbor
                    CAP = jnp.int32(H * W)
                    d_fin = jnp.minimum(d_enemy, CAP)
                    d_here = jnp.minimum(d_fin, 1 + jnp.min(jnp.stack(
                        [K.pull(d_fin, d, fill=CAP) for d in range(4)]),
                        0))
                    away = CAP - jnp.where(mine, d_here, d_fin)
                    mdir = descend_direction(away, free_n)
                    walk = unit_ok & (mdir >= 0)
                    out = _put(out, walk, MOVE, p1=mdir)
                    claimed = claimed | unit_ok
                elif isinstance(cmd, MoveToCoord):
                    unit_ok = (idle & ~claimed & mine & filt(cmd.filter)
                               & lk_move(t) & gate)
                    src = (xs == cmd.x) & (ys == cmd.y)
                    mdir = walk_to(src)
                    walk = unit_ok & (mdir >= 0)
                    out = _put(out, walk, MOVE, p1=mdir)
                    claimed = claimed | unit_ok
                elif isinstance(cmd, MoveToUnit):
                    unit_ok = (idle & ~claimed & mine & filt(cmd.filter)
                               & lk_move(t) & gate)
                    side = enemy if cmd.side == "Enemy" else mine
                    if cmd.target == "Closest":
                        if cmd.side == "Enemy":
                            mdir = descend_direction(d_enemy, free_n)
                        else:
                            # closest OTHER ally (MoveToUnitBasic): the
                            # mover's own cell is ally-distance 0, so a
                            # plain ally field would freeze every unit.
                            # Route toward the nearest DISTINCT source.
                            st2 = distance_field2(mine, passable, iters)
                            flatpos = (
                                jax.lax.broadcasted_iota(
                                    jnp.int32, (H, W), 0) * W
                                + jax.lax.broadcasted_iota(
                                    jnp.int32, (H, W), 1))
                            mdir = descend_direction_excluding(
                                st2, free_n, flatpos)
                    else:
                        free = jnp.ones((H, W), bool)
                        hp_f = state.hp.astype(jnp.float32)
                        score = {
                            "Farthest": distance_field(
                                mine, free, iters).astype(jnp.float32),
                            "Weakest": -hp_f,
                            "LessHealthy": -hp_f,
                            "MostHealthy": hp_f,
                            "Strongest": dmg_plane.astype(jnp.float32),
                            "Random": jax.random.uniform(key, (H, W)),
                        }[cmd.target]
                        s = jnp.where(side, score, -jnp.inf).reshape(-1)
                        pick = jnp.argmax(s)
                        src = (jnp.arange(H * W) == pick).reshape(H, W)
                        mdir = walk_to(src & jnp.any(side))
                    walk = unit_ok & (mdir >= 0)
                    out = _put(out, walk, MOVE, p1=mdir)
                    # only claim units that actually received a MOVE —
                    # a pathless unit stays available to later commands
                    # (Java assigns nothing when findPath fails)
                    claimed = claimed | walk
                elif isinstance(cmd, Cluster):
                    unit_ok = (idle & ~claimed & mine & filt(cmd.filter)
                               & lk_move(t) & gate)
                    n = jnp.maximum(jnp.sum(unit_ok), 1)
                    cx = jnp.sum(jnp.where(unit_ok, xs, 0)) // n
                    cy = jnp.sum(jnp.where(unit_ok, ys, 0)) // n
                    src = (xs == cx) & (ys == cy)
                    mdir = walk_to(src)
                    walk = unit_ok & (mdir >= 0)
                    out = _put(out, walk, MOVE, p1=mdir)
                    claimed = claimed | unit_ok
                elif isinstance(cmd, Idle):
                    unit_ok = (idle & ~claimed & mine & filt(cmd.filter)
                               & gate)
                    claimed = claimed | unit_ok
                else:
                    raise TypeError(cmd)
            return out, claimed

        out = jnp.zeros((H, W, 7), jnp.int32)
        claimed = jnp.zeros((H, W), bool)
        out, _ = run(program, out, claimed, jnp.bool_(True))
        return out

    return bot


def _rank(mask, uid):
    """0-based rank of each True cell by ascending uid (argsort-based,
    same as bots.scripted._rank_by_uid)."""
    return _rank_by_uid(mask, uid)


def _first(mask, uid):
    """Keep only the lowest-uid True cell."""
    return mask & (_rank(mask, uid) == 0)


def _put(out, mask, atype, p1=None, p2=None, p3=None, p4=None, p5=None,
         p6=None):
    cols = [jnp.full(mask.shape, atype, jnp.int32), p1, p2, p3, p4, p5,
            p6]
    for i, v in enumerate(cols):
        if v is None:
            continue
        v = jnp.asarray(v, jnp.int32)
        v = jnp.broadcast_to(v, mask.shape)
        out = out.at[..., i].set(jnp.where(mask, v, out[..., i]))
    return out


# ---- reference programs (the hand-written DslAIScript seed,
# DslAIScript.java:41-90: train 20 workers, 1 harvester, attack-closest) --

SEED_PROGRAM: Program = (
    Train("Base", "Worker", 20),
    Harvest(1),
    Attack("All", "Closest"),
)
