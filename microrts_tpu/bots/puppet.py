"""PuppetSearch: game-tree search over SCRIPT choice points.

TPU re-design of ai/puppet/ (SURVEY.md §2.4; Barriga, Stanescu & Buro):
instead of searching unit-level joint actions, Puppet searches the small
space of *configurable-script* choices — BasicConfigurableScript.java's
choice points UNITTYPE (which type to mass) x EXPAND (take a second base)
— and "applying a move" means simulating the game forward
``step_playout`` ticks with both players driven by their chosen script
configurations (PuppetSearchAB.java:115, :409's simulate()).

Combo space: the choice-point cross product is STATIC (4 unit types x
expand on/off = 8 script configurations built once as rush_bot variants,
BasicConfigurableScript.initializeChoices:463-480), so script dispatch
inside jit is a ``lax.switch`` and whole tournaments of Puppet games
batch with ``vmap`` like every other bot.

Variants:

* ``puppet_ab_bot`` — the PuppetNoPlan(PuppetSearchAB) analog
  (PuppetNoPlan.java:20-26 wraps an AB search re-run every frame): one
  max ply (my combo) + one min ply (opponent combo) expanded EXHAUSTIVELY
  as a vmapped K x K playout matrix, maximin selection — alpha-beta over
  a depth-2 tree visits the same leaves, so the pruning is dropped, not
  the semantics (PuppetSearchAB.java:328-430's iterative-deepening AB
  typically completes depth 2 within its budget);
* ``puppet_mcts_bot`` — PuppetSearchMCTS.java: UCT tree over combo moves
  with alternating max/min plies; a state advances when the min ply
  commits (both combos known), leaves run the evaluation function;
* ``puppet_plan_bot`` — PuppetSearchAB's PLAN mode (getBestActionSoFar
  holds the plan for PLAN_TIME frames, PuppetSearchAB.java:191-230): a
  StatefulBot that re-searches every ``plan_period`` ticks and replays
  the stored combo's script in between.

Documented divergences: static search budgets (node/playout counts, not
wall-clock); fixed step_playout instead of Java's "until next choice
point".  The transposition/cache tables (TranspositionTable.java,
CacheTable.java) are structurally subsumed rather than dropped: the
depth-2 AB variant simulates each (my combo, their combo) leaf exactly
once per move — there are no revisits for a table to dedup — and the
MCTS variant stores every expanded state in its arrays-of-nodes tree,
so revisits descend to stored children without re-simulation.  The only
residual dedup a state-hash table could buy (distinct combo pairs
converging to an identical simulated end state) is measured in
RESULTS.md §P.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..engine.types import State
from ..env.gridnet import GridnetEnv
from ..ops.evaluation import simple_sqrt_eval3
from .believestate import StatefulBot
from .portfolio import _playout_two
from .scripted import RushSpec, rush_bot


def puppet_combos(env: GridnetEnv):
    """The static choice-point cross product
    (BasicConfigurableScript.initializeChoices:463-480): UNITTYPE over
    the types the UTT can field, x EXPAND in {off, on}."""
    cfg = env.cfg
    names, scripts = [], []
    for tname in ("Worker", "Light", "Heavy", "Ranged"):
        if getattr(cfg, f"{tname.lower()}_id") < 0:
            continue
        for expand in (False, True):
            spec = RushSpec(tname,
                            n_harvesters=1 if tname == "Worker" else -1,
                            expand=expand)
            names.append(f"{tname}{'+exp' if expand else ''}")
            scripts.append(rush_bot(env, spec))
    return names, scripts


def puppet_ab_bot(env: GridnetEnv, step_playout: int = 100,
                  eval_fn: Optional[Callable] = None):
    """PuppetNoPlan(PuppetSearchAB) analog: depth-2 maximin over the
    combo space, exhaustive K x K playout matrix (one vmapped batch)."""
    ecfg = env.cfg.engine
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    _, scripts = puppet_combos(env)
    K = len(scripts)
    branches = [(lambda b: lambda s, p, k: b(s, p, k))(b) for b in scripts]
    playout = _playout_two(env, step_playout, eval_fn)

    def bot(state: State, player, key):
        p = jnp.int32(player)

        def pair_value(i, j, k):
            me = lambda s, kk: jax.lax.switch(i, branches, s, p, kk)
            op = lambda s, kk: jax.lax.switch(j, branches, s, 1 - p, kk)
            return playout(state, p, me, op, k)

        key, km, ka = jax.random.split(key, 3)
        ii, jj = jnp.meshgrid(jnp.arange(K), jnp.arange(K), indexing="ij")
        keys = jax.random.split(km, K * K).reshape(K, K, -1)
        scores = jax.vmap(jax.vmap(pair_value))(ii, jj, keys)
        best = jnp.argmax(jnp.min(scores, axis=1))
        return jax.lax.switch(best, branches, state, p, ka)

    return bot


class _PuppetTree(NamedTuple):
    states: State        # [N+1, ...]
    pend: jax.Array      # i32 [N+1] max's committed combo (-1 at max ply)
    is_max: jax.Array    # bool [N+1]
    nterm: jax.Array     # bool [N+1]
    ndepth: jax.Array    # i32 [N+1]
    nvis: jax.Array      # i32 [N+1]
    avis: jax.Array      # i32 [N+1, K]
    aacc: jax.Array      # f32 [N+1, K]
    achild: jax.Array    # i32 [N+1, K]
    nnodes: jax.Array    # i32


def puppet_mcts_bot(env: GridnetEnv, n_playouts: int = 48,
                    max_nodes: int = 64, max_depth: int = 4,
                    step_playout: int = 100, c_uct: float = 0.7,
                    eval_fn: Optional[Callable] = None):
    """PuppetSearchMCTS (ai/puppet/PuppetSearchMCTS.java + PuppetMCTSNode
    .java): UCT over combo moves.  Max plies pick my combo (state
    unchanged, combo pending); min plies pick the opponent's and advance
    the state by a both-scripts simulation of ``step_playout`` ticks.
    Leaf value = evaluation function; move = most-visited root combo."""
    ecfg = env.cfg.engine
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    _, scripts = puppet_combos(env)
    K = len(scripts)
    N, D = max_nodes, max_depth
    branches = [(lambda b: lambda s, p, k: b(s, p, k))(b) for b in scripts]

    def simulate(state, p, i, j, key):
        """Advance by step_playout ticks: my combo i vs their combo j."""
        def body(carry, _):
            s, done, k = carry
            k, k0, k1 = jax.random.split(k, 3)
            am = jax.lax.switch(i, branches, s, p, k0)
            ao = jax.lax.switch(j, branches, s, 1 - p, k1)
            a0 = jnp.where(p == 0, am, ao)
            a1 = jnp.where(p == 0, ao, am)
            s2, _, d2 = env.step(s, a0, a1)
            s3 = jax.tree.map(lambda a, b: jnp.where(done, a, b), s, s2)
            return (s3, done | d2, k), None

        (sf, df, _), _ = jax.lax.scan(
            body, (state, env.engine.gameover(state), key), None,
            length=step_playout)
        return sf, df

    def _row(x, i):
        return jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False)

    def _get_state(states, i):
        return jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
            states)

    def _set_state(states, i, s):
        return jax.tree.map(
            lambda x, v: jax.lax.dynamic_update_index_in_dim(
                x, v.astype(x.dtype), i, 0), states, s)

    def bot(state: State, player, key):
        p = jnp.int32(player)
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (N + 1,) + x.shape), state)
        tree = _PuppetTree(
            states=stacked,
            pend=jnp.full(N + 1, -1, jnp.int32),
            is_max=jnp.ones(N + 1, bool),
            nterm=jnp.zeros(N + 1, bool).at[0].set(
                env.engine.gameover(state)),
            ndepth=jnp.zeros(N + 1, jnp.int32),
            nvis=jnp.zeros(N + 1, jnp.int32),
            avis=jnp.zeros((N + 1, K), jnp.int32),
            aacc=jnp.zeros((N + 1, K), jnp.float32),
            achild=jnp.full((N + 1, K), -1, jnp.int32),
            nnodes=jnp.int32(1))

        def one_playout(_, carry):
            tree, key = carry
            key, kd = jax.random.split(key)
            pn = jnp.full(D + 2, -1, jnp.int32)
            ps = jnp.zeros(D + 2, jnp.int32)

            def descend(step, c):
                t, cur, found, leaf, pn, ps, plen, k = c
                k, ks = jax.random.split(k)
                term = _row(t.nterm, cur) | (_row(t.ndepth, cur) >= D)
                av = _row(t.avis, cur)
                aa = _row(t.aacc, cur)
                unex = av == 0
                any_unex = jnp.any(unex)
                mean = aa / jnp.maximum(av, 1)
                mean = jnp.where(_row(t.is_max, cur), mean, -mean)
                ucb = (mean + 1.0) * 0.5 + c_uct * jnp.sqrt(
                    jnp.log(jnp.maximum(_row(t.nvis, cur), 1)
                            .astype(jnp.float32) + 1.0)
                    / jnp.maximum(av, 1))
                slot = jnp.where(any_unex, jnp.argmax(unex),
                                 jnp.argmax(ucb))
                child = _row(_row(t.achild, cur), slot)

                # child construction (applied only on expansion)
                st = _get_state(t.states, cur)
                im = _row(t.is_max, cur)
                pend = _row(t.pend, cur)
                st2, done2 = simulate(
                    st, p, jnp.maximum(pend, 0), slot, ks)
                cst = jax.tree.map(
                    lambda a, b: jnp.where(im, a, b), st, st2)
                cterm = jnp.where(im, jnp.bool_(False), done2) \
                    | _row(t.nterm, cur)
                need_exp = ~found & ~term & (child < 0)
                room = t.nnodes < N
                do_exp = need_exp & room
                new_id = t.nnodes
                widx = jnp.where(do_exp, new_id, N)
                wcur = jnp.where(do_exp, cur, N)
                t = t._replace(
                    states=_set_state(t.states, widx, cst),
                    pend=t.pend.at[widx].set(jnp.where(im, slot, -1)),
                    is_max=t.is_max.at[widx].set(~im),
                    nterm=t.nterm.at[widx].set(cterm),
                    ndepth=t.ndepth.at[widx].set(_row(t.ndepth, cur) + 1),
                    achild=t.achild.at[wcur, slot].set(new_id),
                    nnodes=t.nnodes + do_exp.astype(jnp.int32))

                hop = ~found & ~term & ((child >= 0) | do_exp)
                pidx = jnp.where(hop, plen, D + 1)
                pn = pn.at[pidx].set(jnp.where(hop, cur, -1))
                ps = ps.at[pidx].set(slot)
                plen = plen + hop.astype(jnp.int32)

                leaf_now = (~found) & (term | do_exp | (need_exp & ~room))
                leaf = jnp.where(found, leaf,
                                 jnp.where(do_exp, new_id,
                                           jnp.where(leaf_now, cur, leaf)))
                nxt = jnp.where(do_exp, new_id,
                                jnp.where(child >= 0, child, cur))
                cur = jnp.where(found | leaf_now, cur, nxt)
                return (t, cur, found | leaf_now, leaf, pn, ps, plen, k)

            (tree, _, _, leaf, pn, ps, plen, _) = jax.lax.fori_loop(
                0, D + 2, descend,
                (tree, jnp.int32(0), jnp.bool_(False), jnp.int32(0),
                 pn, ps, jnp.int32(0), kd))

            v = eval_fn(_get_state(tree.states, leaf), p)
            tree = tree._replace(nvis=tree.nvis.at[leaf].add(1))

            def backprop(i, t):
                active = i < plen
                idx = jnp.where(active, _row(pn, i), N)
                s = _row(ps, i)
                return t._replace(
                    nvis=t.nvis.at[idx].add(1),
                    avis=t.avis.at[idx, s].add(1),
                    aacc=t.aacc.at[idx, s].add(v))

            tree = jax.lax.fori_loop(0, D + 2, backprop, tree)
            return tree, key

        tree, _ = jax.lax.fori_loop(0, n_playouts, one_playout,
                                    (tree, key))
        key, ka = jax.random.split(key)
        best = jnp.argmax(tree.avis[0])
        return jax.lax.switch(best, branches, state, p, ka)

    return bot


def puppet_plan_bot(env: GridnetEnv, plan_period: int = 100,
                    step_playout: int = 100,
                    eval_fn: Optional[Callable] = None) -> StatefulBot:
    """PuppetSearchAB with PLAN mode (PuppetSearchAB.java:191-230): the
    maximin search runs once per ``plan_period`` ticks; in between the
    stored combo's script replays (getBestActionSoFar holds lastMoves)."""
    ecfg = env.cfg.engine
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    _, scripts = puppet_combos(env)
    K = len(scripts)
    branches = [(lambda b: lambda s, p, k: b(s, p, k))(b) for b in scripts]
    playout = _playout_two(env, step_playout, eval_fn)

    def search(state, p, key):
        def pair_value(i, j, k):
            me = lambda s, kk: jax.lax.switch(i, branches, s, p, kk)
            op = lambda s, kk: jax.lax.switch(j, branches, s, 1 - p, kk)
            return playout(state, p, me, op, k)

        ii, jj = jnp.meshgrid(jnp.arange(K), jnp.arange(K), indexing="ij")
        keys = jax.random.split(key, K * K).reshape(K, K, -1)
        scores = jax.vmap(jax.vmap(pair_value))(ii, jj, keys)
        return jnp.argmax(jnp.min(scores, axis=1)).astype(jnp.int32)

    def init(state, player):
        return {"combo": jnp.int32(0), "last_plan": jnp.int32(-plan_period)}

    def step(state, mem, player, key):
        p = jnp.int32(player)
        key, ks, ka = jax.random.split(key, 3)
        due = state.time - mem["last_plan"] >= plan_period
        combo = jax.lax.cond(due, lambda k: search(state, p, k),
                             lambda k: mem["combo"], ks)
        mem = {"combo": combo,
               "last_plan": jnp.where(due, state.time, mem["last_plan"])}
        return jax.lax.switch(combo, branches, state, p, ka), mem

    return StatefulBot(init=init, step=step)
