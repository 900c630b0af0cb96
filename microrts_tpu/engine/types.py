"""Device state for the TPU engine.

The Java engine's object graph (``GameState`` + ``PhysicalGameState`` +
``LinkedHashMap<Unit, UnitActionAssignment>``, GameState.java:37-55) is
re-designed as a fixed-shape struct-of-planes: a unit occupies exactly one
cell and only changes position when a MOVE completes (UnitAction.java:344-359),
so every per-unit attribute — including its in-flight action — lives in an
``[H, W]`` plane.  The LinkedHashMap's insertion order, which defines both
conflict-scan order (GameState.java:263-319) and completion execution order
(GameState.java:553-571), is reified as an explicit ``aorder`` plane: a
monotone issue counter.

Planes carry the NARROWEST dtype their value range allows (``FIELD_DTYPES``):
the engine step is a flat tail of ~100 bandwidth-bound fusions over these
planes, so plane bytes are the throughput (measured: the whole batched state
staying VMEM-resident is worth ~40% at batch 4096 on v5e).  Intermediate
arithmetic freely promotes to int32; every function that RETURNS a State
casts back with ``State.canon()``, keeping scan/while carries stable.
Range notes: ``aparam`` holds NONE durations up to the max ETA (<= produce
time, 250 < 2^15); ``atx``/``aty`` are absolute coordinates (maps <= 32k);
``aorder``/``atime``/``uid`` grow monotonically and stay int32.
One ``State`` is one env; batching is ``vmap``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .pgs import PhysicalGameState
from .utt import UnitTypeTable

# Action types (UnitAction.java:29-59)
NONE = 0
MOVE = 1
HARVEST = 2
RETURN = 3
PRODUCE = 4
ATTACK = 5
NUM_ACTION_TYPES = 6

# Directions (UnitAction.java:68-100); offsets in (dx, dy)
DIR_X = (0, 1, 0, -1)
DIR_Y = (-1, 0, 1, 0)

INF = 1 << 30

# Canonical per-field dtypes (see module docstring).
FIELD_DTYPES = dict(
    terrain=jnp.int8, utype=jnp.int8, owner=jnp.int8,
    hp=jnp.int16, carried=jnp.int16, uid=jnp.int32,
    busy=jnp.bool_, atype=jnp.int8, aparam=jnp.int16,
    atx=jnp.int16, aty=jnp.int16, aptype=jnp.int8,
    aticks=jnp.int16, aorder=jnp.int32, atime=jnp.int32,
    time=jnp.int32, resources=jnp.int32, next_id=jnp.int32,
    order_ctr=jnp.int32, cancel_ctr=jnp.int32,
)


class State(struct.PyTreeNode):
    """One env's complete game state (pytree of jnp arrays)."""

    # --- board planes [H, W] ---
    terrain: jax.Array   # int32, 0 free / 1 wall
    utype: jax.Array     # int32, 0 = no unit, else type_id + 1
    owner: jax.Array     # int32, -1 neutral/none, 0/1 players
    hp: jax.Array        # int32
    carried: jax.Array   # int32: carried resources (units) / remaining (nodes)
    uid: jax.Array       # int32 unit ID (monotone in creation)
    # --- assignment planes [H, W] (valid where busy) ---
    busy: jax.Array      # bool
    atype: jax.Array     # int32 action type 0..5
    aparam: jax.Array    # int32 direction / NONE duration
    atx: jax.Array       # int32 attack target x
    aty: jax.Array       # int32 attack target y
    aptype: jax.Array    # int32 produced type id
    aticks: jax.Array    # int32 ticks until completion (ETA at issue, -1 ok)
    aorder: jax.Array    # int32 global issue order (LinkedHashMap order)
    atime: jax.Array     # int32 issue time (UnitActionAssignment.time) —
    #                      distinguishes same-tick vs cross-cycle conflicts
    # --- scalars ---
    time: jax.Array      # int32
    resources: jax.Array  # int32[2] player stockpiles
    next_id: jax.Array   # int32 (Unit.next_ID analog, Unit.java:34)
    order_ctr: jax.Array  # int32 issue-order counter
    cancel_ctr: jax.Array  # int32 (unitCancelationCounter, GameState.java:38)
    key: jax.Array       # PRNG key (nondet damage, UnitAction.java:360-375)

    def canon(self) -> "State":
        """Cast every field back to its canonical dtype (FIELD_DTYPES).
        Intermediate plane algebra promotes to int32; call this at every
        State-returning boundary so vmap/scan carries stay stable."""
        changed = {
            name: getattr(self, name).astype(dt)
            for name, dt in FIELD_DTYPES.items()
            if getattr(self, name).dtype != dt}
        return self.replace(**changed) if changed else self


class Candidates(struct.PyTreeNode):
    """One tick's decoded candidate actions, one per cell (or atype = -1).

    ``rank`` defines within-tick issue order (the order actions appear in the
    PlayerActions passed to issueSafe; p0 before p1, Game.java:136-137).
    Cells without a candidate must have ``atype = -1`` and ``rank = INF``.
    """

    atype: jax.Array   # int32 [H, W], -1 = no candidate
    aparam: jax.Array  # int32 [H, W]
    atx: jax.Array     # int32 [H, W]
    aty: jax.Array     # int32 [H, W]
    aptype: jax.Array  # int32 [H, W]
    rank: jax.Array    # int32 [H, W]

    @classmethod
    def empty(cls, h: int, w: int) -> "Candidates":
        z = jnp.zeros((h, w), jnp.int32)
        return cls(atype=z - 1, aparam=z, atx=z, aty=z, aptype=z,
                   rank=jnp.full((h, w), INF, jnp.int32))


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static ruleset + shape, hashable so jitted closures cache per config.

    The UTT (rts/units/UnitTypeTable.java:104-289) is flattened to tuples;
    kernels rebuild numpy arrays that fold into the compiled program.
    """

    height: int
    width: int
    num_types: int
    cost: Tuple[int, ...]
    hp: Tuple[int, ...]
    min_damage: Tuple[int, ...]
    max_damage: Tuple[int, ...]
    attack_range: Tuple[int, ...]
    produce_time: Tuple[int, ...]
    move_time: Tuple[int, ...]
    attack_time: Tuple[int, ...]
    harvest_time: Tuple[int, ...]
    return_time: Tuple[int, ...]
    harvest_amount: Tuple[int, ...]
    sight_radius: Tuple[int, ...]
    is_resource: Tuple[bool, ...]
    is_stockpile: Tuple[bool, ...]
    can_harvest: Tuple[bool, ...]
    can_move: Tuple[bool, ...]
    can_attack: Tuple[bool, ...]
    produces: Tuple[Tuple[bool, ...], ...]  # [T, T] producer -> producible
    move_conflict_policy: int = 1           # CANCEL_BOTH (all golden traces)

    @property
    def max_range(self) -> int:
        return max((r for r, c in zip(self.attack_range, self.can_attack) if c),
                   default=1)

    @classmethod
    def from_utt(cls, utt: UnitTypeTable, height: int, width: int) -> "EngineConfig":
        def tup(name):
            return tuple(int(v) for v in getattr(utt, name))

        def btup(name):
            return tuple(bool(v) for v in getattr(utt, name))

        return cls(
            height=height, width=width, num_types=utt.num_types,
            cost=tup("cost"), hp=tup("hp"),
            min_damage=tup("min_damage"), max_damage=tup("max_damage"),
            attack_range=tup("attack_range"), produce_time=tup("produce_time"),
            move_time=tup("move_time"), attack_time=tup("attack_time"),
            harvest_time=tup("harvest_time"), return_time=tup("return_time"),
            harvest_amount=tup("harvest_amount"), sight_radius=tup("sight_radius"),
            is_resource=btup("is_resource"), is_stockpile=btup("is_stockpile"),
            can_harvest=btup("can_harvest"), can_move=btup("can_move"),
            can_attack=btup("can_attack"),
            produces=tuple(tuple(bool(v) for v in row)
                           for row in utt.produces_mask),
            move_conflict_policy=int(utt.move_conflict_resolution_strategy),
        )


# ----------------------------------------------------------------------
# Host <-> device conversion (for map loading, replay and tests)

def state_from_pgs(pgs: PhysicalGameState, cfg: EngineConfig,
                   time: int = 0, seed: int = 0) -> State:
    """Build a device State from a host map snapshot (no in-flight actions)."""
    h, w = cfg.height, cfg.width
    assert pgs.height == h and pgs.width == w
    utype = np.zeros((h, w), np.int32)
    owner = np.full((h, w), -1, np.int32)
    hp = np.zeros((h, w), np.int32)
    carried = np.zeros((h, w), np.int32)
    uid = np.zeros((h, w), np.int32)
    for u in pgs.units:
        utype[u.y, u.x] = u.type_id + 1
        owner[u.y, u.x] = u.player
        hp[u.y, u.x] = u.hitpoints
        carried[u.y, u.x] = u.resources
        uid[u.y, u.x] = u.ID
    res = np.zeros(2, np.int32)
    for p in pgs.players:
        res[p.ID] = p.resources
    z = np.zeros((h, w), np.int32)
    return State(
        terrain=jnp.asarray(pgs.terrain.reshape(h, w), jnp.int32),
        utype=jnp.asarray(utype), owner=jnp.asarray(owner),
        hp=jnp.asarray(hp), carried=jnp.asarray(carried), uid=jnp.asarray(uid),
        busy=jnp.zeros((h, w), bool),
        atype=jnp.asarray(z), aparam=jnp.asarray(z), atx=jnp.asarray(z),
        aty=jnp.asarray(z), aptype=jnp.asarray(z), aticks=jnp.asarray(z),
        aorder=jnp.asarray(z), atime=jnp.asarray(z) - 1,
        time=jnp.int32(time), resources=jnp.asarray(res),
        next_id=jnp.int32(max((u.ID for u in pgs.units), default=-1) + 1),
        order_ctr=jnp.int32(0), cancel_ctr=jnp.int32(0),
        key=jax.random.PRNGKey(seed),
    ).canon()


def snapshot(state: State):
    """Order-free comparable fingerprint (mirrors interop.replay.snapshot_tuple)."""
    utype = np.asarray(state.utype)
    h, w = utype.shape
    units = []
    for y in range(h):
        for x in range(w):
            if utype[y, x] > 0:
                units.append((int(np.asarray(state.owner)[y, x]),
                              int(utype[y, x]) - 1, x, y,
                              int(np.asarray(state.carried)[y, x]),
                              int(np.asarray(state.hp)[y, x])))
    return (tuple(sorted(units)),
            tuple(int(v) for v in np.asarray(state.resources)))
