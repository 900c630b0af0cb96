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
  Closest / Weakest / Strongest / MostHealthy mirror
  DSLParametersConcrete/{ClosestEnemy,WeakestEnemy,...}.java
* ``MoveAway(filter)``             — MoveAwayBasic.java
* ``Idle(filter)``                 — keep units home (defense atom)
* ``If(cond, then)``               — IfFunction.java
* ``For(n, body)``                 — ForFunction.java (static unroll)

Conditions (DSLBasicBoolean): ``NAllyOfType(type, >=, k)``,
``EnemyInRange(r)`` (enemy within r of any own base), ``CanAfford(type)``.
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
from ..ops.fields import descend_direction, distance_field
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
class NAllyOfType:
    unit: str
    k: int                 # true iff count(own units of type) >= k


@dataclasses.dataclass(frozen=True)
class EnemyInRange:
    r: int                 # true iff an enemy is within r of an own base


@dataclasses.dataclass(frozen=True)
class CanAfford:
    unit: str


Cond = Union[NAllyOfType, EnemyInRange, CanAfford]


@dataclasses.dataclass(frozen=True)
class If:
    cond: Cond
    then: Tuple["Command", ...]


@dataclasses.dataclass(frozen=True)
class For:
    n: int
    body: Tuple["Command", ...]


Command = Union[Train, Build, Harvest, Attack, MoveAway, Idle, If, For]
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

        def cond_value(c) -> jax.Array:
            if isinstance(c, NAllyOfType):
                return count_of(c.unit) >= c.k
            if isinstance(c, EnemyInRange):
                # enemy within r (path distance) of an own base
                near = (d_base <= c.r) & enemy
                return jnp.any(near)
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
                s = score_fn(hp_at.astype(jnp.float32),
                             dmg_at.astype(jnp.float32))
                take = e_at & (s > best_s)
                rel = (R + dy) * D + (R + dx)
                best_rel = jnp.where(take, rel, best_rel)
                best_s = jnp.where(take, s, best_s)
            return best_rel, jnp.isfinite(best_s)

        TARGETS = {
            "Closest": lambda hp, dmg: jnp.zeros_like(hp),  # scan order
            "Weakest": lambda hp, dmg: -hp,
            "MostHealthy": lambda hp, dmg: hp,
            "Strongest": lambda hp, dmg: dmg,
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
                    unit_ok = (idle & ~claimed & mine & filt(cmd.filter)
                               & gate)
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
