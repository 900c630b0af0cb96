"""Decision-point fast-forward playouts (GameState.getNextChangeTime analog).

Java search bots simulate between DECISION POINTS: `getNextChangeTime`
(rts/GameState.java:532-546) tells the playout loop when the next unit
frees up, and everything in between is plain `cycle()` calls with no
action generation (NaiveMCTS's simulate loop, ai/mcts/naivemcts/
NaiveMCTS.java:225-240; MonteCarlo.java's playout).  Actions are durative
(moveTime=10, harvestTime=20 ...), so MOST playout ticks are dead — no
unit of either player can act.

The TPU engine's live step is ~75% actor (legal-mask construction +
sampling) and ~20% decode; issue+cycle together are <15%
(scripts/profile_step.py).  Paying the actor on dead ticks is therefore
the single biggest waste in every search bot's playout.  This module is
the TPU-shaped fast-forward: a playout is a `lax.scan` over at most
``n_decisions`` DECISION steps (actor + decode + issue + cycle), each
followed by a cheap `while_loop` of cycle-only ticks that coasts to the
next decision point, game end, or the playout's time cap.  A closed-form
jump (min over in-flight ETAs) would be unsound — a completion mid-gap
can free a cell and enable an earlier decision (produce/move completions
cascade) — so the coast runs real per-tick `cycle`s; they are the cheap
15%.

Under ``vmap`` the coast's `while_loop` batches the standard JAX way: it
runs while ANY lane still coasts and freezes finished lanes with selects
— cycle is cheap enough that the longest lane bounding the batch is fine.

Budget semantics (documented divergence from the tick-budgeted Java
playouts): a playout covers up to ``playout_len`` ticks of game time OR
``n_decisions`` decision points, whichever exhausts first.  Dense boards
(a decision nearly every tick) truncate to ~``n_decisions`` ticks; sparse
boards cover the full ``playout_len`` at a fraction of the cost.  The
evaluation-time discount uses the actual reached game time, like
NaiveMCTS.iteration:200-206.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..engine.types import INF, NONE, State


def can_act(s: State, player) -> jax.Array:
    """GameState.canExecuteAnyAction: any own idle unit (NONE is always
    among a unit's actions, so idle <=> can act)."""
    return jnp.any((s.utype > 0) & (s.owner == jnp.int32(player)) & ~s.busy)


def decision_point(s: State) -> jax.Array:
    """True when ANY unit of EITHER player can be issued an action."""
    return jnp.any((s.utype > 0) & (s.owner >= 0) & ~s.busy)


def playout_step(env, s: State, a0, a1, none_duration: int = 10,
                 jump_to_event: bool = False, t_end=None,
                 max_skip: int = 512):
    """One self-play EVENT with BOT-path NONE semantics and no reward
    computation.  Java playout policies sample from
    ``Unit.getUnitActions(gs)`` whose idle action is NONE(10)
    (Unit.java:368-370), and the bot path pads with
    ``fillWithNones(gs, player, 10)`` (AbstractionLayerAI.java:111) — vs
    the RL path's NONE(1) (JNIAI.java:53).  A unit that idles therefore
    SLEEPS ``none_duration`` ticks, which is what makes decision points
    sparse and the fast-forward effective.  Rewards are skipped (playouts
    are scored by evaluation functions, not reward functions).

    ``jump_to_event=True`` is the fused `getNextChangeTime` jump: after
    both issues every unit is busy (pads included), so NOTHING can change
    until the earliest completion — jump ``min(busy aticks) - 1`` dead
    ticks in closed form (time += k, busy aticks -= k; exactly what k
    dense cycles would do), then run the ONE real `cycle` of the
    completion tick (skipped by select when the jump hits ``t_end``
    first).  This keeps the whole decision step a single fused body —
    measured cheaper than any scan-of-while coast at small batch, where
    wall cost tracks FUSION COUNT, not FLOPs."""

    def patch(c):
        return c.replace(aparam=jnp.where(c.atype == NONE,
                                          jnp.int32(none_duration),
                                          c.aparam))

    c0, _, _ = env.decode(s, a0, 0, env._inflight_claims(s),
                          env._inflight_spent(s, 0))
    s1 = env.engine.issue_env(s, patch(c0))
    c1, _, _ = env.decode(s1, a1, 1, env._inflight_claims(s1),
                          env._inflight_spent(s1, 1))
    s2 = env.engine.issue_env(s1, patch(c1))
    if not jump_to_event:
        return env.engine.cycle(s2)
    min_eta = jnp.min(jnp.where(s2.busy, s2.aticks.astype(jnp.int32), INF))
    k = jnp.clip(min_eta - 1, 0, max_skip)
    if t_end is not None:
        k = jnp.minimum(k, jnp.maximum(t_end - s2.time, 0))
        do_cycle = (s2.time + k) < t_end
    s2 = s2.replace(time=s2.time + k,
                    aticks=jnp.where(s2.busy, s2.aticks - k,
                                     s2.aticks)).canon()
    s3, d3 = env.engine.cycle(s2)
    if t_end is not None:
        s3 = jax.tree.map(lambda a, b: jnp.where(do_cycle, b, a), s2, s3)
        d3 = jnp.where(do_cycle, d3, env.engine.gameover(s2))
    return s3, d3


def fast_forward(env, s: State, done, t_end=None, max_skip: int = 512,
                 max_events: int = 2, unroll: bool = True):
    """Jump to the next decision point (or game end / ``t_end``) —
    the `getNextChangeTime` analog (GameState.java:532-546), EVENT-driven
    and exact:

    Between action completions NOTHING in the state can change: no
    damage, no moves, no spawns, no deaths — `cycle` only decrements
    ``aticks`` and bumps ``time`` (engine/kernel.py cycle:508-516).  So
    each "event step" (a) jumps ``min(busy aticks) - 1`` dead ticks in
    CLOSED FORM (time += k, busy aticks -= k), then (b) runs ONE real
    `cycle` for the completion tick.  Every completion idles its unit
    (the assignment is removed), so the post-cycle state is almost
    always a decision point — ``max_events`` unrolled steps (select-
    frozen once a decision point / ``done`` / the cap is reached) cover
    the rest; a rare longer chain is finished by the caller's next
    iteration.

    Unrolled rather than a `while_loop` of cycles: measured on the
    tunneled v5e, a cycle costs ~2 us inside a fused scan but ~10 us as
    a while_loop iteration, and each loop ENTRY materializes the whole
    State at the loop boundary — scan-of-while structures were paying
    more for boundaries than for the skipped actor work.

    For NON-deterministic UTTs (v3) a dense run splits the PRNG key once
    per tick while the jump consumes one split per EVENT; damage draws
    still use fresh subkeys at completion ticks, so playouts remain
    correctly distributed but are not bit-identical to per-tick cycling
    (deterministic UTTs are bit-exact — cycle never touches the key).

    ``max_skip`` bounds one closed-form jump (stuck states with no busy
    units would otherwise jump time to the i32 horizon).

    ``unroll=True`` inlines ``max_events`` straight-line event steps —
    the right shape for TOP-LEVEL scan bodies (tournament / stateful
    match loops), where fused straight-line code beats while_loop
    boundaries.  ``unroll=False`` wraps ONE event step in a
    `lax.while_loop` — mandatory inside search bots' own while-loop
    bodies: inlining N copies of `cycle` into a DFS/tree-iteration body
    multiplies the HLO and sent round-4 compiles of the minimax bots
    past 45 MINUTES (two pytest workers stuck in backend_compile);
    the loop form keeps ONE cycle copy and compiles in minutes."""
    eng = env.engine

    def step(s, done):
        live = (~done) & ~decision_point(s)
        if t_end is not None:
            live = live & (s.time < t_end)
        min_eta = jnp.min(jnp.where(s.busy, s.aticks.astype(jnp.int32),
                                    INF))
        k = jnp.clip(min_eta - 1, 0, max_skip)
        if t_end is not None:
            to_cap = jnp.maximum(t_end - s.time, 0)
            k = jnp.minimum(k, to_cap)
            do_cycle = (s.time + k) < t_end
        else:
            do_cycle = jnp.bool_(True)
        k = jnp.where(live, k, 0)
        s_j = s.replace(
            time=s.time + k,
            aticks=jnp.where(s.busy, s.aticks - k, s.aticks)).canon()
        s_c, d_c = eng.cycle(s_j)
        take_c = live & do_cycle
        s = jax.tree.map(lambda a, b: jnp.where(take_c, b, a), s_j, s_c)
        done = jnp.where(take_c, done | d_c, done)
        return s, done

    if unroll:
        for _ in range(max_events):
            s, done = step(s, done)
        return s, done

    def cond(c):
        s, done, n = c
        live = (~done) & (n < max_events) & ~decision_point(s)
        if t_end is not None:
            live = live & (s.time < t_end)
        return live

    def body(c):
        s, done, n = c
        s, done = step(s, done)
        return (s, done, n + 1)

    s, done, _ = jax.lax.while_loop(cond, body, (s, done, jnp.int32(0)))
    return s, done


def run_playout(env, act2: Callable, s: State, key, playout_len: int,
                n_decisions: int, max_skip: int = 512,
                none_duration: int = 10):
    """Run one fast-forward playout.  ``act2(state, key) -> (a0, a1)``
    produces both players' gridnet action tensors at a decision point.
    Returns ``(final_state, done)`` after up to ``playout_len`` game
    ticks / ``n_decisions`` decision steps.

    Each scan iteration is one EVENT: act (anyone idle gets an action or
    a NONE(10) pad), then the fused jump-to-next-completion
    (``playout_step(jump_to_event=True)``) — so iterations walk decision
    frames directly, with no separate coast in the body.  On a frame
    where nobody can act (a completion that killed its unit) the decode
    no-ops and the jump simply advances to the next event."""
    t_end = s.time + jnp.int32(playout_len)
    done0 = env.engine.gameover(s)

    def dec(carry, k):
        s, done = carry
        live = (~done) & (s.time < t_end)
        a0, a1 = act2(s, k)
        s2, d2 = playout_step(env, s, a0, a1, none_duration,
                              jump_to_event=True, t_end=t_end,
                              max_skip=max_skip)
        s = jax.tree.map(lambda a, b: jnp.where(live, b, a), s, s2)
        done = jnp.where(live, done | d2, done)
        return (s, done), None

    (s, done), _ = jax.lax.scan(
        dec, (s, done0), jax.random.split(key, n_decisions))
    # trailing coast: complete in-flight actions up to the cap (pending
    # attacks land; evaluation happens at the first un-budgeted decision).
    # Runs once per playout (not per scan step), so the loop form's
    # boundary cost is negligible — and playouts live inside search bots'
    # while bodies, where inlined cycle copies explode compile time.
    s, done = fast_forward(env, s, done, t_end, max_skip, unroll=False)
    return s, done


def decisions_for(playout_len: int) -> int:
    """Default decision budget for a ``playout_len``-tick playout.  The
    fastest action (Worker attackTime=5) bounds how often a unit can
    re-decide; with staggered phases a decision every ~4 ticks covers
    dense boards, and sparse boards coast further per decision."""
    return max(2, playout_len // 4)


def make_playout(env, playout_len: int, eval_fn: Callable,
                 gamma: float = 1.0, rollout_bot: Optional[Callable] = None,
                 n_eval: int = 1, n_decisions: Optional[int] = None,
                 max_skip: int = 512):
    """Build ``playout(state, player, t0, key) -> value``: a fast-forward
    playout with ``rollout_bot`` (default RandomBiasedAI analog) on both
    sides, scored by ``eval_fn`` from ``player``'s view and discounted by
    ``gamma^((t_final - t0)/10)`` (NaiveMCTS.iteration:200-206;
    ``gamma=1.0`` disables discounting).  ``playout_len=0`` evaluates the
    state directly (the minimax leaf).

    ``n_eval > 1`` runs that many playouts from the same state IN
    PARALLEL (vmapped over keys) and returns their mean — the TPU-shaped
    way to buy value accuracy: the Java bots buy it with thousands of
    sequential iterations; here extra playouts per iteration are batch
    width at the SAME wall-clock cost per move."""
    if rollout_bot is None:
        from ..bots.scripted import random_bot
        rollout_bot = random_bot(env, 5.0)
    if n_decisions is None:
        n_decisions = decisions_for(playout_len)

    def act2(s, k):
        k0, k1 = jax.random.split(k)
        return rollout_bot(s, 0, k0), rollout_bot(s, 1, k1)

    def playout(s: State, player, t0, key):
        if playout_len > 0:
            sf, _ = run_playout(env, act2, s, key, playout_len,
                                n_decisions, max_skip)
        else:
            sf = s
        v = eval_fn(sf, player)
        if gamma == 1.0:
            return v
        dt = (sf.time - t0).astype(jnp.float32)
        return v * jnp.power(jnp.float32(gamma), dt / 10.0)

    if n_eval <= 1:
        return playout

    def playout_wide(s: State, player, t0, key):
        vs = jax.vmap(lambda k: playout(s, player, t0, k))(
            jax.random.split(key, n_eval))
        return jnp.mean(vs)

    return playout_wide


def make_playout_two(env, playout_len: int, eval_fn: Callable,
                     n_decisions: Optional[int] = None,
                     max_skip: int = 512):
    """Two-policy fast-forward playout for the portfolio family:
    ``run(state, player, me, opp, key) -> value`` where ``me``/``opp``
    are ``(state, key) -> [H, W, 7]`` already bound to their player id
    (PortfolioAI.java:100-190 playout shape)."""
    if n_decisions is None:
        n_decisions = decisions_for(playout_len)

    def run(state: State, player, me: Callable, opp: Callable, key):
        def act2(s, k):
            k0, k1 = jax.random.split(k)
            am, ao = me(s, k0), opp(s, k1)
            a0 = jnp.where(jnp.int32(player) == 0, am, ao)
            a1 = jnp.where(jnp.int32(player) == 0, ao, am)
            return a0, a1

        sf, _ = run_playout(env, act2, state, key, playout_len,
                            n_decisions, max_skip)
        return eval_fn(sf, player)

    return run
