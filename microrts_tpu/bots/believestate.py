"""Believe-state search under partial observability: BS1/BS2/BS3 wrappers.

TPU re-design of ai/mcts/believestatemcts/ (SURVEY.md §2.4,
AIWithBelieveState.java, BS1_NaiveMCTS.java, BS2_NaiveMCTS.java,
BS3_NaiveMCTS.java): a stateful memory of the opponent's last-seen and
inferred units completes the fog-of-war view into a "sampled world" that
any full-observability search bot can plan in.

The Java classes keep ``LinkedList<Unit> lastKnownPosition / inferedUnits``
and mutate them per call.  Here the believe memory is a dense PYTREE of
planes — believed-unit type/hp/uid grids, a seen-type vector, and the
previous tick's observed view — so the whole update is shift/select
algebra that jits and vmaps (whole PO tournaments batch like everything
else).  The wrapped bot is *stateful*: ``init(state, player) -> mem`` and
``step(state, mem, player, key) -> (action, mem)``.

Believe rules (BS3_NaiveMCTS.java:224-340 ``updateBelieveState``):

* an enemy unit present last tick whose cell is now free: if it was moving
  into a now-unobservable cell, or it was static and its cell fell out of
  sight without being under attack, remember it at its last position
  (:228-254, ``wasUnderAttack`` :361-371);
* a believed unit whose cell became observable (so the guess is wrong)
  relocates to the nearest unobservable free cell, spiral order (:374-414
  ``getClosestNotObservableLocationNear``); no valid cell = forget it;
* first sight of a new enemy unit type whose producer type was never seen
  infers a producer building near the sighting (:256-277);
* a believed unit is forgotten when the real unit (matched by ID) shows up
  again (:289-306), and inferred units are forgotten when a real unit of
  their type is seen (:279-287);
* ``sample_world`` (:169-222) overlays the believed units onto the
  current view wherever the believed cell is free.

Documented divergences:

* the relocation spiral is truncated at a static radius (``SPIRAL_R``);
  Java spirals to max(H, W).  Believed units that cannot relocate within
  the radius are forgotten (rare: it needs the whole disc observed);
* simultaneous relocations resolve in spiral-offset order (each shift is a
  bijection, so two units never claim one cell); Java processes units
  sequentially in list order;
* BS1's "initial buildings only" memory comes from the first ``init``
  state rather than a separate preGameAnalysis callback.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..engine import kernel as K
from ..engine.fog import po_state, visibility
from ..engine.types import ATTACK, MOVE, State
from ..env.gridnet import GridnetEnv


class BelieveMem(NamedTuple):
    b_utype: jax.Array    # i32 [H, W] believed enemy unit type (1-based, 0=none)
    b_hp: jax.Array       # i32 [H, W]
    b_uid: jax.Array      # i32 [H, W] real uid for remembered, 0 for inferred
    seen_type: jax.Array  # bool [T] enemy types ever observed
    prev: State           # last tick's po view (the observer's)
    prev_vis: jax.Array   # bool [H, W] last tick's visibility


class StatefulBot(NamedTuple):
    """The stateful-bot protocol: memory rides across ticks explicitly."""
    init: Callable   # (state, player) -> mem
    step: Callable   # (state, mem, player, key) -> (action [H,W,7], mem)


def stateless(bot: Callable) -> StatefulBot:
    """Adapt a stateless bot(state, player, key) to the protocol."""
    return StatefulBot(init=lambda s, p: (),
                       step=lambda s, m, p, k: (bot(s, p, k), ()))


def _spiral_offsets(radius: int):
    """Outward counterclockwise spiral, Java's order
    (BS3_NaiveMCTS.getClosestNotObservableLocationNear:374-411):
    start one step down, lengths 1,1,2,2,3,3..., turn dx,dy -> dy,-dx."""
    offs, x, y = [], 0, 0
    dx, dy, length, j, first = 0, 1, 1, 0, True
    while max(abs(x), abs(y)) <= radius or length <= 2 * radius:
        x, y = x + dx, y + dy
        if abs(x) <= radius and abs(y) <= radius and (x, y) != (0, 0):
            offs.append((x, y))
        j += 1
        if j == length:
            j = 0
            if not first:
                length += 1
            first = not first
            dx, dy = dy, -dx
        if length > 2 * radius + 2:
            break
    # dedup, keep first occurrence (spiral may revisit none, but be safe)
    seen, out = set(), []
    for o in offs:
        if o not in seen:
            seen.add(o)
            out.append(o)
    return out


def _targeted_by_attack(view: State, cfg) -> jax.Array:
    """bool [H, W]: cells some visible unit is attacking
    (wasUnderAttack, BS3:361-371).  atx/aty are absolute coordinates; the
    dense form scans the static attack-range offset box."""
    R = max(cfg.attack_range)
    H, W = view.utype.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    attacking = (view.utype > 0) & view.busy & (view.atype == ATTACK)
    out = jnp.zeros((H, W), bool)
    for oy in range(-R, R + 1):
        for ox in range(-R, R + 1):
            if ox == 0 and oy == 0:
                continue
            # an attacker at (y-oy, x-ox) hitting absolute (x, y) here
            src = K._shift(attacking, ox, oy, fill=False)
            tx = K._shift(view.atx, ox, oy, fill=-1)
            ty = K._shift(view.aty, ox, oy, fill=-1)
            out = out | (src & (tx == xs) & (ty == ys))
    return out


def believe_state_bot(env: GridnetEnv, inner_bot: Callable, *,
                      level: int = 3, spiral_r: int = 6) -> StatefulBot:
    """Wrap a full-observability bot into a believe-state PO bot.

    ``level`` selects the reference variant: 1 = remember only the
    opponent units unobserved at game start, never update (BS1_NaiveMCTS
    .java:24-99); 2 = track last-known positions, no inference/relocation
    (BS2_NaiveMCTS.java); 3 = full BS3 (inference + relocation).
    """
    cfg = env.cfg.engine
    T = cfg.num_types
    H, W = env.h, env.w
    spiral = _spiral_offsets(min(spiral_r, max(H, W) - 1))
    # producer of type t = first listed producer (BS3:265 producedBy.get(0))
    producer_of = [-1] * T
    prod_hp = list(cfg.hp)
    for t in range(T):
        for p in range(T):
            if cfg.produces[p][t]:
                producer_of[t] = p
                break

    def init(state: State, player) -> BelieveMem:
        """setInitialBelieveState (BS3:144-159): every opponent unit not
        observable at start is remembered; its type counts as seen."""
        opp = 1 - jnp.int32(player)
        vis = visibility(state, player, cfg)
        view = po_state(state, player, cfg)
        hidden = (state.utype > 0) & (state.owner == opp) & ~vis
        seen = jnp.zeros(T, bool)
        for t in range(T):
            seen = seen.at[t].set(jnp.any(hidden & (state.utype == t + 1)))
        return BelieveMem(
            b_utype=jnp.where(hidden, state.utype, 0).astype(jnp.int32),
            b_hp=jnp.where(hidden, state.hp, 0).astype(jnp.int32),
            b_uid=jnp.where(hidden, state.uid, 0).astype(jnp.int32),
            seen_type=seen,
            prev=view, prev_vis=vis)

    PAD = min(spiral_r, max(H, W) - 1) + 1
    spiral_tab = jnp.asarray(spiral, jnp.int32) if spiral else \
        jnp.zeros((0, 2), jnp.int32)

    def _dyn_shift(x, ox, oy, fill):
        """_shift with TRACED offsets: pad + dynamic_slice (one compiled
        body for the whole spiral walk, vs unrolling ~170 offsets)."""
        p = jnp.pad(x, PAD, constant_values=fill)
        return jax.lax.dynamic_slice(p, (PAD - oy, PAD - ox), x.shape)

    def _relocate(bel, need, vis, free):
        """Move each ``need`` unit to the nearest unobservable free
        believe-free cell in spiral order; unresolved units drop
        (BS3:374-414).  Returns updated (b_utype, b_hp, b_uid).  The
        spiral is a ``fori_loop`` over the offset table — each shift is a
        bijection, so simultaneous relocations never claim one cell."""
        b_utype, b_hp, b_uid = bel
        unres_t = jnp.where(need, b_utype, 0)
        unres_h = jnp.where(need, b_hp, 0)
        unres_u = jnp.where(need, b_uid, 0)
        b_utype = jnp.where(need, 0, b_utype)
        b_hp = jnp.where(need, 0, b_hp)
        b_uid = jnp.where(need, 0, b_uid)

        def body(i, c):
            b_utype, b_hp, b_uid, unres_t, unres_h, unres_u = c
            ox, oy = spiral_tab[i, 0], spiral_tab[i, 1]
            tgt_ok = ~vis & free & (b_utype == 0)
            cand_t = _dyn_shift(unres_t, ox, oy, 0)
            cand_h = _dyn_shift(unres_h, ox, oy, 0)
            cand_u = _dyn_shift(unres_u, ox, oy, 0)
            place = (cand_t > 0) & tgt_ok
            b_utype = jnp.where(place, cand_t, b_utype)
            b_hp = jnp.where(place, cand_h, b_hp)
            b_uid = jnp.where(place, cand_u, b_uid)
            resolved = _dyn_shift(place, -ox, -oy, False)
            unres_t = jnp.where(resolved, 0, unres_t)
            unres_h = jnp.where(resolved, 0, unres_h)
            unres_u = jnp.where(resolved, 0, unres_u)
            return (b_utype, b_hp, b_uid, unres_t, unres_h, unres_u)

        (b_utype, b_hp, b_uid, _, _, _) = jax.lax.fori_loop(
            0, len(spiral), body,
            (b_utype, b_hp, b_uid, unres_t, unres_h, unres_u))
        return b_utype, b_hp, b_uid

    def update(mem: BelieveMem, state: State, player) -> BelieveMem:
        """updateBelieveState (BS3:224-340), dense."""
        me = jnp.int32(player)
        opp = 1 - me
        vis = visibility(state, player, cfg)
        view = po_state(state, player, cfg)
        prev, prev_vis = mem.prev, mem.prev_vis
        b_utype, b_hp, b_uid = mem.b_utype, mem.b_hp, mem.b_uid
        seen = mem.seen_type

        now_enemy = (view.utype > 0) & (view.owner == opp)
        now_exists = view.utype > 0
        now_free = (state.terrain == 0) & ~now_exists
        prev_enemy = (prev.utype > 0) & (prev.owner == opp)

        if level >= 2:
            # --- units that vanished from view (BS3:228-254) ------------
            gone = prev_enemy & now_free
            moving = prev.busy & (prev.atype == MOVE)
            # move target cell per direction plane
            tgt_unobs = jnp.zeros((H, W), bool)
            for d in range(4):
                # the cell the unit moves INTO is its direction-d neighbor;
                # pull reads the target cell's value back at the source
                tgt_unobs = tgt_unobs | ((prev.aparam == d)
                                         & K.pull(~vis, d, fill=False))
            moved_to_fog = gone & moving & tgt_unobs
            attacked = _targeted_by_attack(prev, cfg)
            static_lost = gone & ~moving & ~vis & ~attacked
            remember = (moved_to_fog | static_lost) & (b_utype == 0)
            b_utype = jnp.where(remember, prev.utype, b_utype)
            b_hp = jnp.where(remember, prev.hp, b_hp)
            b_uid = jnp.where(remember, prev.uid, b_uid)

            # --- forget believed units whose real unit re-appeared ------
            # (BS3:289-306) — match by uid anywhere on the board
            vis_uids = jnp.where(now_enemy, view.uid, 0)

            def uid_seen(bu):
                return jnp.any((vis_uids == bu) & (vis_uids > 0))

            for_uid = (b_uid > 0) & jax.vmap(jax.vmap(uid_seen))(b_uid)
            b_utype = jnp.where(for_uid, 0, b_utype)
            b_hp = jnp.where(for_uid, 0, b_hp)
            b_uid = jnp.where(for_uid, 0, b_uid)

        if level >= 3:
            # --- inference of unseen producers (BS3:256-277) ------------
            new_inf_t = jnp.zeros((H, W), jnp.int32)
            for t in range(T):
                pt = producer_of[t]
                if pt < 0:
                    continue
                now_t = now_enemy & (view.utype == t + 1)
                first_sight = jnp.any(now_t) & ~seen[t]
                need_inf = first_sight & ~seen[pt] & ~jnp.any(
                    now_enemy & (view.utype == pt + 1))
                # seed at the first (row-major) sighted unit of type t
                flat = now_t.reshape(-1)
                pos = jnp.argmax(flat)
                seed = (jnp.arange(H * W) == pos).reshape(H, W) & need_inf
                new_inf_t = jnp.where(seed & (new_inf_t == 0),
                                      pt + 1, new_inf_t)
                seen = seen.at[t].set(seen[t] | jnp.any(now_t))
            # place inferred producers near the sighting (spiral relocate
            # from the seed cell — the seed itself is visible)
            if spiral:
                inf_hp = jnp.zeros((H, W), jnp.int32)
                for t in range(T):
                    inf_hp = jnp.where(new_inf_t == t + 1,
                                       prod_hp[t], inf_hp)
                b_utype2, b_hp2, b_uid2 = _relocate(
                    (jnp.where(new_inf_t > 0, new_inf_t, b_utype),
                     jnp.where(new_inf_t > 0, inf_hp, b_hp),
                     jnp.where(new_inf_t > 0, 0, b_uid)),
                    new_inf_t > 0, vis, now_free)
                b_utype, b_hp, b_uid = b_utype2, b_hp2, b_uid2

            # --- forget inferred units once their type is seen ----------
            # (BS3:279-287): inferred = uid 0
            for t in range(T):
                t_vis = jnp.any(now_enemy & (view.utype == t + 1))
                drop = (b_utype == t + 1) & (b_uid == 0) & t_vis
                b_utype = jnp.where(drop, 0, b_utype)
                b_hp = jnp.where(drop, 0, b_hp)

            # --- relocate believed units on observed cells (BS3:174-194,
            # :308-334 — also covers visible units moving/producing onto
            # a believed cell, since those cells are observable) ---------
            bad = (b_utype > 0) & vis
            b_utype, b_hp, b_uid = _relocate(
                (b_utype, b_hp, b_uid), bad, vis, now_free)
        elif level == 2:
            # BS2: no relocation — believed unit on an observed free cell
            # is simply wrong and forgotten
            bad = (b_utype > 0) & vis
            b_utype = jnp.where(bad, 0, b_utype)
            b_hp = jnp.where(bad, 0, b_hp)
            b_uid = jnp.where(bad, 0, b_uid)
        else:
            # BS1: initial buildings only, removed when their cell is
            # observed free (destroyed or never there)
            bad = (b_utype > 0) & vis & now_free
            b_utype = jnp.where(bad, 0, b_utype)
            b_hp = jnp.where(bad, 0, b_hp)
            b_uid = jnp.where(bad, 0, b_uid)

        return BelieveMem(b_utype=b_utype, b_hp=b_hp, b_uid=b_uid,
                          seen_type=seen, prev=view, prev_vis=vis)

    def sample_world(state: State, mem: BelieveMem, player) -> State:
        """Overlay believed units onto the observer's view where the cell
        is free (sampleWorld, BS3:169-222)."""
        opp = 1 - jnp.int32(player)
        view = po_state(state, player, cfg)
        free = (state.terrain == 0) & (view.utype == 0)
        put = free & (mem.b_utype > 0)
        return view.replace(
            utype=jnp.where(put, mem.b_utype, view.utype),
            owner=jnp.where(put, opp, view.owner),
            hp=jnp.where(put, mem.b_hp, view.hp),
            uid=jnp.where(put, jnp.where(mem.b_uid > 0, mem.b_uid,
                                         jnp.int32(1 << 20)), view.uid),
        ).canon()

    def step(state: State, mem: BelieveMem, player, key):
        mem = update(mem, state, player)
        world = sample_world(state, mem, player)
        return inner_bot(world, player, key), mem

    return StatefulBot(init=init, step=step)


def play_matches_stateful(env: GridnetEnv, bot0: StatefulBot,
                          bot1: StatefulBot, n_games: int,
                          max_cycles: int = 2000, seed: int = 0,
                          chunk: int = None):
    """Lockstep stateful games (the believe-state analog of
    eval.tournament.play_matches): both bots' memories ride the scan
    carry.  Dispatched in CHUNK-frame slices like eval.tournament (long
    single dispatches crash the tunneled TPU worker).  Like the
    tournament loop, the game advances DECISION FRAME by decision frame
    with cycle-only fast-forward in between — lossless even for the
    believe-state observers, because every observable change (a move
    mutating position, a produce, a death) happens at an action
    completion, i.e. exactly at a tick where that unit goes idle, which
    IS a decision frame.  Returns winners int[n_games] (0, 1, -1)."""
    import numpy as np

    from ..eval.tournament import CHUNK
    from ..ops.playout import fast_forward
    if chunk is None:
        chunk = CHUNK

    def init(key):
        s = env.reset(key)
        return (s, bot0.init(s, 0), bot1.init(s, 1), jnp.asarray(False),
                jnp.int32(-1), key)

    def chunk_fn(carry, length):
        def body(c, _):
            s, m0, m1, done, winner, k = c
            s, d_ff = fast_forward(env, s, done,
                                   t_end=jnp.int32(max_cycles))
            winner = jnp.where(done, winner,
                               jnp.where(d_ff, env.engine.winner(s), -1))
            done = done | d_ff | (s.time >= max_cycles)
            k, k0, k1 = jax.random.split(k, 3)
            a0, m0n = bot0.step(s, m0, 0, k0)
            a1, m1n = bot1.step(s, m1, 1, k1)
            s2, _, done2 = env.step(s, a0, a1)
            frz = lambda old, new: jax.tree.map(
                lambda a, b: jnp.where(done, a, b), old, new)
            s3 = frz(s, s2)
            m0 = frz(m0, m0n)
            m1 = frz(m1, m1n)
            winner = jnp.where(done, winner,
                               jnp.where(done2, env.engine.winner(s2), -1))
            return (s3, m0, m1, done | done2, winner, k), None

        return jax.lax.scan(body, carry, None, length=length)[0]

    init_v = jax.jit(jax.vmap(init))
    chunk_v = jax.jit(jax.vmap(chunk_fn, in_axes=(0, None)),
                      static_argnums=1)
    carry = init_v(jax.random.split(jax.random.PRNGKey(seed), n_games))
    left = max_cycles
    while left > 0:
        n = min(chunk, left)
        carry = chunk_v(carry, n)
        left -= n
        if bool(carry[3].all()):
            break
    return np.asarray(carry[4])
