"""Game-tree search with real trees: NaiveMCTS and UCT, arrays-of-nodes.

TPU re-design of the reference's MCTS family (SURVEY.md §2.4).  The Java
implementations (ai/mcts/naivemcts/NaiveMCTS.java:140-210,
NaiveMCTSNode.java:115-330; ai/mcts/uct/UCT.java, DownsamplingUCT.java)
grow a pointer tree of cloned GameStates on the host.  Here the tree is a
FIXED-budget structure-of-arrays — node i's state is row i of a stacked
State pytree, per-unit statistics are dense ``[N, H, W, A]`` tables over
the arm catalog (ops/arms.py), and one search iteration (select leaf →
playout → propagate) is a jitted fixed-trip loop, so whole tournaments of
tree-search games batch with ``vmap``.

Semantics matched to the reference:

* alternating max/min nodes over SIMULTANEOUS moves: a node belongs to the
  player that can act, maxplayer preferred; after both have committed the
  state cycles forward to the next decision point (NaiveMCTSNode
  constructor:38-114, ABCD-style duration handling);
* naive sampling: with prob 1−ε₀ exploit the global MAB (ε_g-greedy over
  existing children); otherwise sample each unit's arm from its local MAB —
  uniform over UNVISITED legal arms while any exists
  (forceExplorationOfNonSampledActions=true collapses the Java best-arm
  scan to exactly this), else ε_l-greedy on the per-arm mean
  (NaiveMCTSNode.selectLeafUsingLocalMABs:196-260);
* evaluation: playout with RandomBiasedAI both sides for ``playout_len``
  ticks, scored by an evaluation function ×0.99^(Δt/10)
  (NaiveMCTS.iteration:195-210), propagated along the path with per-arm
  credit at every edge (NaiveMCTSNode.propagateEvaluation:338-366);
* final move = most-visited root child (getMostVisitedActionIdx:240-260).

Documented divergences (all budget-shape, not behavior):

* node/children budgets are static (``max_nodes``/``max_children``); when
  exhausted the current node is evaluated as a leaf instead of expanding —
  the Java tree is unbounded;
* cross-unit resource consistency of a sampled joint action is resolved by
  the engine's decode (exactly like every executed action) instead of the
  Java resample-until-consistent loop;
* joint actions are keyed by their full arm plane (exact compare), like
  the BigInteger action codes of childrenMap.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..engine.types import State
from ..env.gridnet import GridnetEnv
from ..ops.arms import (ArmSpace, arm_masks, arm_space, arms_to_action,
                        one_hot_arms, sample_arms)
from ..ops.evaluation import simple_sqrt_eval3
from ..ops.playout import can_act as _po_can_act
from ..ops.playout import fast_forward
from ..ops.playout import make_playout as _shared_make_playout
from .scripted import random_bot


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


def _stack_state(s: State, n: int) -> State:
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), s)


_can_act = _po_can_act


def _issue_player(env: GridnetEnv, s: State, action, player) -> State:
    """Issue one player's gridnet action tensor (decode resolves claims
    against in-flight reservations cumulatively, like issueSafe)."""
    c, _, _ = env.decode(s, action, player, env._inflight_claims(s),
                         env._inflight_spent(s, player))
    return env.engine.issue(s, c)


def _advance(env: GridnetEnv, s: State, max_wait: int = 512):
    """Advance to the next decision point or game end (the node-
    constructor loop, NaiveMCTSNode.java:46-52), via the event-driven
    fast-forward.  4 completion events virtually always reach a decision
    point (every completion idles its unit); a state still frozen after
    them is treated as terminal."""
    s, done = fast_forward(env, s, env.engine.gameover(s),
                           max_skip=max_wait, max_events=4, unroll=False)
    stuck = ~(_can_act(s, 0) | _can_act(s, 1))
    return s, done | (stuck & ~done)


def _make_playout(env: GridnetEnv, playout_len: int, eval_fn, gamma: float,
                  rollout_bot=None, n_eval: int = 1,
                  n_decisions: Optional[int] = None):
    """Shared fast-forward playout (ops/playout.py): actor+decode run only
    at decision points, cycle-only ticks coast in between
    (getNextChangeTime analog, GameState.java:532-546).  Returns the
    evaluation from ``player``'s perspective discounted by gamma^(Δt/10)
    from ``t0`` (NaiveMCTS.iteration:200-206).  Default rollout policy is
    the RandomBiasedAI analog; ABCD passes WorkerRush (ABCD.java:50-52)."""
    return _shared_make_playout(env, playout_len, eval_fn, gamma=gamma,
                                rollout_bot=rollout_bot, n_eval=n_eval,
                                n_decisions=n_decisions)


# ======================================================================
# NaiveMCTS

class _NaiveTree(NamedTuple):
    states: State        # [N+1, ...] (row N = write scratch)
    nplayer: jax.Array   # i32 [N+1] player to move
    nterm: jax.Array     # bool [N+1]
    ndepth: jax.Array    # i32 [N+1]
    nacc: jax.Array      # f32 [N+1]
    nvis: jax.Array      # i32 [N+1]
    tacc: jax.Array      # f32 [N+1, H, W, A] per-unit arm evaluations
    tvis: jax.Array      # i32 [N+1, H, W, A] per-unit arm visit counts
    children: jax.Array  # i32 [N+1, C]
    carms: jax.Array     # i8 [N+1, C, H, W] edge arm plane per child
    nchild: jax.Array    # i32 [N+1]
    nnodes: jax.Array    # i32


def naive_mcts_bot(env: GridnetEnv, n_playouts: int = 64,
                   max_nodes: int = 96, max_children: int = 16,
                   max_depth: int = 10, playout_len: int = 100,
                   eps0: float = 0.4, eps_l: float = 0.3,
                   eps_g: float = 0.0, gamma: float = 0.99,
                   eval_fn: Optional[Callable] = None,
                   prior_fn: Optional[Callable] = None,
                   local_policy: str = "egreedy", ucb_c: float = 0.05,
                   rollout_bot: Optional[Callable] = None,
                   phase2: Optional[tuple] = None,
                   phase1_ratio: float = 0.5, n_eval: int = 1,
                   n_decisions: Optional[int] = None):
    """NaiveMCTS (ai/mcts/naivemcts/NaiveMCTS.java) with per-unit CMAB
    tables and a bounded batched tree.  Budgets are static (the Java
    ITERATIONS_BUDGET analog is ``n_playouts``; TIME_BUDGET has no analog
    for a jitted bot).

    ``prior_fn(state, player, legal_arms) -> [H, W, A]`` turns this into
    InformedNaiveMCTS (InformedNaiveMCTSNode.java:181-238): exploration
    mass follows the learned distribution instead of uniform, and while a
    unit still has unvisited arms, sampling is prior-weighted over them.
    ``local_policy="ucb"`` gives the MLPSMCTS per-unit rule
    (MLPSNode.java:130-211): deterministic argmax of exploitation +
    ucb_c * M*sqrt((M+1)*ln n / n_ij), unvisited arms first.
    ``phase2=(eps0', eps_l', eps_g')`` gives TwoPhaseNaiveMCTS
    (ai/mcts/naivemcts/TwoPhaseNaiveMCTS.java:36-90): after
    ``phase1_ratio`` of the playout budget the epsilons switch —
    canonically explore-then-exploit (eps0 1.0 -> 0.0).

    Epsilon/lookahead/depth defaults match the canonical Java ctor
    ``NaiveMCTS(utt)`` (NaiveMCTS.java:66-71: e_l=0.3, e_g=0.0, e_0=0.4,
    lookahead 100, depth 10)."""
    ecfg = env.cfg.engine
    H, W = env.h, env.w
    sp = arm_space(env)
    A = sp.n_arms
    N, C, D = max_nodes, max_children, max_depth
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    playout = _make_playout(env, playout_len, eval_fn, gamma, rollout_bot,
                            n_eval=n_eval, n_decisions=n_decisions)

    def init_tree(state: State, player) -> _NaiveTree:
        return _NaiveTree(
            states=_set_state(_stack_state(state, N + 1), 0, state),
            nplayer=jnp.zeros(N + 1, jnp.int32).at[0].set(
                jnp.int32(player)),
            nterm=jnp.zeros(N + 1, bool).at[0].set(
                env.engine.gameover(state)),
            ndepth=jnp.zeros(N + 1, jnp.int32),
            nacc=jnp.zeros(N + 1, jnp.float32),
            nvis=jnp.zeros(N + 1, jnp.int32),
            tacc=jnp.zeros((N + 1, H, W, A), jnp.float32),
            tvis=jnp.zeros((N + 1, H, W, A), jnp.int32),
            children=jnp.full((N + 1, C), -1, jnp.int32),
            carms=jnp.full((N + 1, C, H, W), -1, jnp.int8),
            nchild=jnp.zeros(N + 1, jnp.int32),
            nnodes=jnp.int32(1))

    def local_sample(t: _NaiveTree, cur, p, maxp, key, cur_eps_l):
        """One naive-sampling draw of a joint action at node ``cur``:
        per-cell local MABs (selectLeafUsingLocalMABs:196-260; informed
        variant :181-238; MLPS UCB variant MLPSNode.java:130-211)."""
        st = _get_state(t.states, cur)
        m = env.engine.legal_masks(st, p)
        la = arm_masks(sp, m)
        tv = _row(t.tvis, cur)
        ta = _row(t.tacc, cur)
        unv = la & (tv == 0)
        any_unv = jnp.any(unv, -1, keepdims=True)
        nleg = jnp.maximum(jnp.sum(la, -1, keepdims=True), 1)
        mean = ta / jnp.maximum(tv, 1)
        mean = jnp.where(p == maxp, mean, -mean)   # min node: prefer low
        if local_policy == "unit_uct":
            # UCTUnitActions (ai/mcts/uct/UCTUnitActionsNode.java): each
            # tree level decides ONE unit — the first idle own unit in
            # board order (:49-62); unvisited actions expand in list
            # order (attacks first, NONE last, :86-96), else UCB1 with
            # C*normalized exploitation + sqrt(ln(n/n_j)) (:100-119)
            H_, W_ = la.shape[0], la.shape[1]
            can_flat = m["can_act"].reshape(-1)
            first = jnp.argmax(can_flat)
            cell = (jnp.arange(can_flat.shape[0]) == first).reshape(H_, W_)
            la1 = la & cell[..., None]
            unv1 = la1 & (tv == 0)
            n = jnp.maximum(_row(t.nvis, cur), 1).astype(jnp.float32)
            exploit = (mean + 1.0) * 0.5        # bound-normalized
            explore = jnp.sqrt(jnp.maximum(
                jnp.log(n / jnp.maximum(tv, 1).astype(jnp.float32)),
                0.0))
            score = jnp.where(la1 & ~unv1,
                              ucb_c * exploit + explore, -jnp.inf)
            arm_ids = jax.lax.broadcasted_iota(jnp.int32, la.shape, 2)
            last_unv = jnp.max(jnp.where(unv1, arm_ids, -1), -1)
            pick = jnp.where(jnp.any(unv1, -1), last_unv,
                             jnp.argmax(score, -1))
            dist = (arm_ids == pick[..., None]).astype(jnp.float32)
            dist = jnp.where(la1, dist, 0.0)
            return sample_arms(sp, key, dist,
                               m["can_act"] & cell), st
        if local_policy == "ucb":
            # MLPS: per-unit UCB1, unvisited first (explorationValue's
            # n_ij=0 -> MAX_VALUE; the Java tie-break lands on the unit's
            # FIRST listed action — attacks first, NONE last
            # (Unit.getUnitActions:389-519) — which in arm-index order is
            # the HIGHEST unvisited arm); M = the node's widest unit
            M = jnp.max(jnp.sum(la, -1)).astype(jnp.float32)
            n = jnp.maximum(_row(t.nvis, cur), 1).astype(jnp.float32)
            explore = M * jnp.sqrt(
                (M + 1.0) * jnp.log(n)
                / jnp.maximum(tv, 1).astype(jnp.float32))
            score = jnp.where(la & ~unv, mean + ucb_c * explore, -jnp.inf)
            arm_ids = jax.lax.broadcasted_iota(jnp.int32, la.shape, 2)
            last_unv = jnp.max(jnp.where(unv, arm_ids, -1), -1)
            pick = jnp.where(jnp.any(unv, -1), last_unv,
                             jnp.argmax(score, -1))
            dist = (arm_ids == pick[..., None]).astype(jnp.float32)
            dist = jnp.where(la, dist, 0.0)
            return sample_arms(sp, key, dist, m["can_act"]), st
        best = jnp.argmax(jnp.where(la & (tv > 0), mean, -jnp.inf), -1)
        greedy = (jax.lax.broadcasted_iota(jnp.int32, la.shape, 2)
                  == best[..., None])
        if prior_fn is not None:
            pri = prior_fn(st, p, la)
            dist_vis = (cur_eps_l * pri
                        + jnp.where(greedy, 1.0 - cur_eps_l, 0.0))
            dist = jnp.where(any_unv, jnp.where(unv, pri, 0.0),
                             jnp.where(la, dist_vis, 0.0))
            # a cell whose legal-but-unvisited arms all have zero prior
            # still needs mass: fall back to uniform over them
            zrow = (jnp.sum(dist, -1, keepdims=True) <= 0.0)
            dist = jnp.where(zrow & unv, 1.0, dist)
        else:
            dist_vis = (cur_eps_l / nleg
                        + jnp.where(greedy, 1.0 - cur_eps_l, 0.0))
            dist = jnp.where(any_unv, jnp.where(unv, 1.0, 0.0),
                             jnp.where(la, dist_vis, 0.0))
        return sample_arms(sp, key, dist, m["can_act"]), st

    def search(tree: _NaiveTree, maxp, t0, key,
               n_iters=None) -> _NaiveTree:
        """Run select/playout/propagate iterations on an existing tree
        (the computeDuringOneGameFrame loop).  ``n_iters`` (default the
        static ``n_playouts``) may be a TRACED count — the anytime
        budget of the ContinuingAI wrapper (fori_loop lowers to a
        while_loop); the TwoPhase switch point stays keyed to the
        static budget."""

        def one_playout(it, carry):
            tree, key = carry
            key, kd, kp = jax.random.split(key, 3)
            if phase2 is None:
                cur_eps0, cur_eps_l, cur_eps_g = eps0, eps_l, eps_g
            else:
                in1 = it < int(n_playouts * phase1_ratio)
                cur_eps0 = jnp.where(in1, eps0, phase2[0])
                cur_eps_l = jnp.where(in1, eps_l, phase2[1])
                cur_eps_g = jnp.where(in1, eps_g, phase2[2])

            # ---- select leaf (fixed-trip descent) -------------------
            path = jnp.full(D + 2, -1, jnp.int32)
            earm = jnp.full((D + 2, H, W), -1, jnp.int8)

            def descend(step, c):
                (t, cur, found, leaf, path, earm, plen, k) = c
                k, k0, k1, k2, k3 = jax.random.split(k, 5)
                p = _row(t.nplayer, cur)
                term = _row(t.nterm, cur) | (_row(t.ndepth, cur) >= D)
                nch = _row(t.nchild, cur)

                # global MAB (selectFromAlreadySampledEpsilonGreedy)
                crow = _row(t.children, cur)
                cvis = jnp.take(t.nvis, jnp.maximum(crow, 0))
                cacc = jnp.take(t.nacc, jnp.maximum(crow, 0))
                mean = cacc / jnp.maximum(cvis, 1)
                sgn = jnp.where(p == maxp, 1.0, -1.0)
                slots = jnp.arange(C)
                score = jnp.where(slots < nch, sgn * mean, -jnp.inf)
                gslot = jnp.where(
                    jax.random.uniform(k0) < cur_eps_g,
                    jax.random.randint(k1, (), 0, jnp.maximum(nch, 1)),
                    jnp.argmax(score))
                gchild = _row(crow, gslot)
                garms = _row(_row(t.carms, cur), gslot)
                use_global = (nch > 0) \
                    & (jax.random.uniform(k2) >= cur_eps0) \
                    & ~term & ~found

                # local MABs
                arms, st = local_sample(t, cur, p, maxp, k3,
                                        cur_eps_l)
                arms8 = arms.astype(jnp.int8)

                # child lookup by exact arm-plane compare (childrenMap)
                eq = (_row(t.carms, cur) == arms8[None])
                matches = (slots < nch) & jnp.all(
                    eq.reshape(C, -1), axis=-1)
                matched = jnp.any(matches)
                mchild = _row(crow, jnp.argmax(matches))

                # expansion (computed every step, applied when needed)
                st1 = _issue_player(env, st, arms_to_action(sp, arms), p)
                st2, done2 = _advance(env, st1)
                can_max = _can_act(st2, maxp)
                can_min = _can_act(st2, 1 - maxp)
                cplayer = jnp.where(can_max, maxp, 1 - maxp)
                cterm = done2 | (~can_max & ~can_min)
                need_exp = ~found & ~term & ~use_global & ~matched
                room = (t.nnodes < N) & (nch < C)
                do_exp = need_exp & room
                new_id = t.nnodes
                widx = jnp.where(do_exp, new_id, N)
                wcur = jnp.where(do_exp, cur, N)
                slotc = jnp.clip(nch, 0, C - 1)
                t = t._replace(
                    states=_set_state(t.states, widx, st2),
                    nplayer=t.nplayer.at[widx].set(cplayer),
                    nterm=t.nterm.at[widx].set(cterm),
                    ndepth=t.ndepth.at[widx].set(_row(t.ndepth, cur) + 1),
                    children=t.children.at[wcur, slotc].set(new_id),
                    carms=t.carms.at[wcur, slotc].set(arms8),
                    nchild=t.nchild.at[wcur].add(1),
                    nnodes=t.nnodes + do_exp.astype(jnp.int32))

                # bookkeeping: path entry on every hop through an edge
                move_g = use_global
                move_m = ~found & ~term & ~use_global & matched
                hop = move_g | move_m | do_exp
                edge = jnp.where(move_g, garms, arms8)
                pidx = jnp.where(hop, plen, D + 1)
                path = path.at[pidx].set(jnp.where(hop, cur, -1))
                earm = earm.at[pidx].set(edge)
                plen = plen + hop.astype(jnp.int32)

                leaf_now = (~found) & (term | (need_exp & ~room) | do_exp)
                leaf = jnp.where(
                    found, leaf,
                    jnp.where(do_exp, new_id,
                              jnp.where(term | (need_exp & ~room),
                                        cur, leaf)))
                nxt = jnp.where(move_g, gchild,
                                jnp.where(move_m, mchild, cur))
                nxt = jnp.where(do_exp, new_id, nxt)
                cur = jnp.where(found, cur, nxt)
                return (t, cur, found | leaf_now, leaf, path, earm,
                        plen, k)

            (tree, _, _, leaf, path, earm, plen, _) = jax.lax.fori_loop(
                0, D + 2, descend,
                (tree, jnp.int32(0), jnp.bool_(False), jnp.int32(0),
                 path, earm, jnp.int32(0), kd))

            # ---- playout + propagate -------------------------------
            v = playout(_get_state(tree.states, leaf), maxp, t0, kp)
            tree = tree._replace(nacc=tree.nacc.at[leaf].add(v),
                                 nvis=tree.nvis.at[leaf].add(1))

            def backprop(i, t):
                active = i < plen
                idx = jnp.where(active, _row(path, i), N)
                e = _row(earm, i).astype(jnp.int32)
                oh = one_hot_arms(sp, jnp.where(e >= 0, e, -1))
                return t._replace(
                    nacc=t.nacc.at[idx].add(v),
                    nvis=t.nvis.at[idx].add(1),
                    tacc=t.tacc.at[idx].add(
                        jnp.where(oh, v, 0.0)),
                    tvis=t.tvis.at[idx].add(oh.astype(jnp.int32)))

            tree = jax.lax.fori_loop(0, D + 2, backprop, tree)
            return tree, key

        n = n_playouts if n_iters is None else n_iters
        tree, _ = jax.lax.fori_loop(0, n, one_playout, (tree, key))
        return tree

    def best_action(tree: _NaiveTree):
        # most-visited root child (getMostVisitedActionIdx)
        crow = tree.children[0]
        vis = jnp.where(jnp.arange(C) < tree.nchild[0],
                        jnp.take(tree.nvis, jnp.maximum(crow, 0)), -1)
        slot = jnp.argmax(vis)
        best = _row(tree.carms[0], slot).astype(jnp.int32)
        act = arms_to_action(sp, best)
        return jnp.where(tree.nchild[0] > 0, act,
                         jnp.zeros_like(act))

    def bot(state: State, player, key):
        maxp = jnp.int32(player)
        tree = init_tree(state, maxp)
        tree = search(tree, maxp, state.time, key)
        return best_action(tree)

    # expose the pieces for the tree-reuse (ContinuingAI) wrapper
    bot.init_tree = init_tree
    bot.search = search
    bot.best_action = best_action
    bot.dims = (N, C, D)
    return bot


# ======================================================================
# Tree reuse across moves (ContinuingAI / InterruptibleAI analog)

# planes/scalars that must match for a tree node's state to BE the real
# game state (PRNG key excluded: playouts never mutate stored states, but
# the real env consumed different key splits)
_MATCH_FIELDS = ("utype", "owner", "hp", "carried", "busy", "atype",
                 "aparam", "atx", "aty", "aptype", "aticks", "time",
                 "resources")


def _node_state_matches(states: State, s: State) -> jax.Array:
    """bool [N+1]: which stacked node states physically equal ``s``."""
    ok = None
    for f in _MATCH_FIELDS:
        a, b = getattr(states, f), getattr(s, f)
        eq = (a == b[None]).reshape(a.shape[0], -1).all(axis=-1)
        ok = eq if ok is None else (ok & eq)
    return ok


def naive_mcts_continuing(env: GridnetEnv, per_frame: int = None, **kw):
    """NaiveMCTS with TREE REUSE across consecutive getAction calls — the
    ContinuingAI/InterruptibleAI contract (ContinuingAI.java:11-149,
    InterruptibleAI.java:47-66) in StatefulBot form.

    ``per_frame`` switches on the ANYTIME budget: ContinuingAI grants the
    search a slice of computation on EVERY game frame, so the budget a
    move enjoys is proportional to the frames elapsed since the last
    decision (think-while-idle).  The decision-frame game loop compresses
    those idle frames away, so the wrapper accounts for them at the
    decision point instead: iterations = clip(per_frame x frames_elapsed,
    per_frame, n_playouts) as a traced count into ``search``.  Memory
    becomes ``(tree, last_decision_time)``.  ``per_frame=None`` keeps the
    fixed per-move budget (and the bare-tree memory).

    Between moves the ``_NaiveTree`` rides in the bot memory.  On each
    call the tree is RE-ROOTED at the node whose stored state physically
    matches the real game state (the child reached by this bot's executed
    action, or the grandchild that also includes the opponent's reply —
    both were simulated during search, so an exact plane compare finds
    them); the matched subtree is compacted to the array head with its
    statistics intact, its root state is replaced by the REAL state, and
    ``n_playouts`` fresh iterations extend it.  No match (the opponent
    played something never sampled) falls back to a fresh tree, exactly
    like startNewComputation.

    Because the game loop invokes bots at every decision frame — including
    frames where only the OPPONENT can act — the reused tree also
    accumulates thinking during idle frames, which is precisely
    ContinuingAI's "keep thinking while no unit can act"."""
    from .believestate import StatefulBot

    base = naive_mcts_bot(env, **kw)
    N, C, D = base.dims

    def _to_move(state: State, maxp):
        """Root at the player who can actually act (the Java node ctor's
        toMove, NaiveMCTSNode.java:56-62).  On frames where only the
        OPPONENT acts, this roots the idle-frame thinking directly at his
        decision — so his sampled moves are root CHILDREN and the next
        real frame re-roots one level deep instead of two."""
        return jnp.where(_can_act(state, maxp), maxp, 1 - maxp)

    def _fresh(state: State, maxp) -> _NaiveTree:
        t = base.init_tree(state, maxp)
        return t._replace(nplayer=t.nplayer.at[0].set(
            _to_move(state, maxp)))

    def _reroot(tree: _NaiveTree, state: State, maxp) -> _NaiveTree:
        fresh = _fresh(state, maxp)
        idx = jnp.arange(N + 1)
        valid = idx < tree.nnodes
        match = _node_state_matches(tree.states, state) & valid
        # prefer the most-visited matching node (deepest re-root wins:
        # a grandchild match implies its ancestors no longer apply)
        score = jnp.where(match, tree.nvis + 1, 0)
        m = jnp.argmax(score)
        found = jnp.any(match)

        # reachability from m through the children lists (bounded by D+2)
        slots_ok = (jax.lax.broadcasted_iota(jnp.int32, (N + 1, C), 1)
                    < tree.nchild[:, None])
        child = jnp.where(slots_ok, tree.children, -1)
        adj = jnp.zeros((N + 1, N + 1), bool)
        adj = adj.at[jnp.repeat(idx, C),
                     jnp.clip(child, 0, N).reshape(-1)].max(
            (child >= 0).reshape(-1))
        reach = idx == m
        for _ in range(D + 2):
            reach = reach | (jnp.einsum(
                "i,ij->j", reach.astype(jnp.int32),
                adj.astype(jnp.int32)) > 0)
        reach = reach & valid

        # compact: m -> 0, other reachable nodes -> 1.. in index order
        r2 = reach & (idx != m)
        new_idx = jnp.where(idx == m, 0,
                            jnp.where(r2, jnp.cumsum(r2), N))
        remap_child = jnp.where(
            (child >= 0) & jnp.take(reach, jnp.clip(child, 0, N)),
            jnp.take(new_idx, jnp.clip(child, 0, N)), -1)
        base_depth = _row(tree.ndepth, m)

        def scat(fresh_arr, arr):
            return fresh_arr.at[new_idx].set(arr.astype(fresh_arr.dtype))

        out = _NaiveTree(
            states=jax.tree.map(scat, fresh.states, tree.states),
            nplayer=scat(fresh.nplayer, tree.nplayer),
            nterm=scat(fresh.nterm, tree.nterm),
            ndepth=scat(fresh.ndepth, tree.ndepth - base_depth),
            nacc=scat(fresh.nacc, tree.nacc),
            nvis=scat(fresh.nvis, tree.nvis),
            tacc=scat(fresh.tacc, tree.tacc),
            tvis=scat(fresh.tvis, tree.tvis),
            children=scat(fresh.children, remap_child),
            carms=scat(fresh.carms, tree.carms),
            nchild=scat(fresh.nchild, tree.nchild),
            nnodes=jnp.sum(reach.astype(jnp.int32)))
        # row N (scatter dump) must stay inert; root state := REAL state
        out = out._replace(
            states=_set_state(out.states, 0, state),
            nplayer=out.nplayer.at[0].set(_to_move(state, maxp)),
            nterm=out.nterm.at[0].set(env.engine.gameover(state)),
            children=out.children.at[N].set(-1),
            nchild=out.nchild.at[N].set(0))
        return jax.tree.map(
            lambda a, b: jnp.where(found, a, b), out, fresh)

    if per_frame is None:
        def init(state: State, player):
            return _fresh(state, jnp.int32(player))

        def step(state: State, mem, player, key):
            maxp = jnp.int32(player)
            tree = _reroot(mem, state, maxp)
            tree = base.search(tree, maxp, state.time, key)
            act = base.best_action(tree)
            # on opponent-only frames the root holds HIS candidate moves
            # — never play them; the thinking is kept for the next
            # re-root
            act = jnp.where(_can_act(state, maxp), act,
                            jnp.zeros_like(act))
            return act, tree
    else:
        cap = kw.get("n_playouts", 100)

        def init(state: State, player):
            return (_fresh(state, jnp.int32(player)), state.time)

        def step(state: State, mem, player, key):
            maxp = jnp.int32(player)
            tree, last_t = mem
            dt = jnp.maximum(state.time - last_t, 1)
            n = jnp.clip(dt * per_frame, per_frame, cap).astype(jnp.int32)
            tree = _reroot(tree, state, maxp)
            tree = base.search(tree, maxp, state.time, key, n_iters=n)
            act = base.best_action(tree)
            act = jnp.where(_can_act(state, maxp), act,
                            jnp.zeros_like(act))
            return act, (tree, state.time)

    return StatefulBot(init=init, step=step)


# ======================================================================
# UCT with tree growth (DownsamplingUCT move sets)

class _UCTTree(NamedTuple):
    states: State        # [N+1, ...]
    nplayer: jax.Array   # i32 [N+1]
    nterm: jax.Array     # bool [N+1]
    ndepth: jax.Array    # i32 [N+1]
    nvis: jax.Array      # i32 [N+1] node visits (for ln N)
    acand: jax.Array     # i8 [N+1, K, H, W] candidate joint actions
    avis: jax.Array      # i32 [N+1, K]
    aacc: jax.Array      # f32 [N+1, K]
    achild: jax.Array    # i32 [N+1, K] child node per arm (-1 = none)
    nnodes: jax.Array    # i32


def uct_tree_bot(env: GridnetEnv, n_playouts: int = 64,
                 max_nodes: int = 96, n_candidates: int = 8,
                 max_depth: int = 8, playout_len: int = 100,
                 c_uct: float = 0.7, gamma: float = 0.99,
                 eval_fn: Optional[Callable] = None,
                 fpu: Optional[float] = None, n_eval: int = 1,
                 n_decisions: Optional[int] = None):
    """UCT over a downsampled move set with REAL tree growth
    (ai/mcts/uct/DownsamplingUCT.java + UCTNode tree semantics): each node
    carries K uniformly sampled candidate joint actions; unexplored
    candidates expand first (UCTNode.UCTSelectLeaf), then UCB1 with the
    [-1,1] evaluation mapped to [0,1]; move = most-visited root arm.

    ``fpu`` gives UCTFirstPlayUrgency (ai/mcts/uct/UCTFirstPlayUrgency
    .java, UCTNodeFirstPlayUrgency): instead of forcing every unvisited
    candidate to expand before any UCB step, an unvisited candidate
    competes with the fixed first-play-urgency score ``fpu``."""
    ecfg = env.cfg.engine
    H, W = env.h, env.w
    sp = arm_space(env)
    N, K, D = max_nodes, n_candidates, max_depth
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    playout = _make_playout(env, playout_len, eval_fn, gamma,
                            n_eval=n_eval, n_decisions=n_decisions)

    def sample_cands(s: State, p, key):
        m = env.engine.legal_masks(s, p)
        la = arm_masks(sp, m).astype(jnp.float32)
        return jax.vmap(
            lambda k: sample_arms(sp, k, la, m["can_act"])
            .astype(jnp.int8))(jax.random.split(key, K))

    def bot(state: State, player, key):
        maxp = jnp.int32(player)
        key, kc = jax.random.split(key)
        t0 = state.time
        tree = _UCTTree(
            states=_set_state(_stack_state(state, N + 1), 0, state),
            nplayer=jnp.zeros(N + 1, jnp.int32).at[0].set(maxp),
            nterm=jnp.zeros(N + 1, bool).at[0].set(
                env.engine.gameover(state)),
            ndepth=jnp.zeros(N + 1, jnp.int32),
            nvis=jnp.zeros(N + 1, jnp.int32),
            acand=jnp.full((N + 1, K, H, W), -1, jnp.int8).at[0].set(
                sample_cands(state, maxp, kc)),
            avis=jnp.zeros((N + 1, K), jnp.int32),
            aacc=jnp.zeros((N + 1, K), jnp.float32),
            achild=jnp.full((N + 1, K), -1, jnp.int32),
            nnodes=jnp.int32(1))

        def one_playout(_, carry):
            tree, key = carry
            key, kd, kp = jax.random.split(key, 3)
            path_n = jnp.full(D + 2, -1, jnp.int32)
            path_s = jnp.zeros(D + 2, jnp.int32)

            def descend(step, c):
                t, cur, found, leaf, pn, ps, plen, k = c
                k, kc2 = jax.random.split(k)
                p = _row(t.nplayer, cur)
                term = _row(t.nterm, cur) | (_row(t.ndepth, cur) >= D)

                av = _row(t.avis, cur)
                aa = _row(t.aacc, cur)
                unex = av == 0
                any_unex = jnp.any(unex)
                first_unex = jnp.argmax(unex)
                mean = aa / jnp.maximum(av, 1)
                mean = jnp.where(p == maxp, mean, -mean)
                expl = (mean + 1.0) * 0.5 + c_uct * jnp.sqrt(
                    jnp.log(jnp.maximum(_row(t.nvis, cur), 1).astype(
                        jnp.float32) + 1.0) / jnp.maximum(av, 1))
                if fpu is None:
                    slot = jnp.where(any_unex, first_unex,
                                     jnp.argmax(expl))
                else:
                    slot = jnp.argmax(jnp.where(unex, jnp.float32(fpu),
                                                expl))
                arms = _row(_row(t.acand, cur), slot).astype(jnp.int32)
                child = _row(_row(t.achild, cur), slot)

                # expansion when the chosen arm has no child yet
                st = _get_state(t.states, cur)
                st1 = _issue_player(env, st,
                                    arms_to_action(sp, arms), p)
                st2, done2 = _advance(env, st1)
                can_max = _can_act(st2, maxp)
                can_min = _can_act(st2, 1 - maxp)
                cplayer = jnp.where(can_max, maxp, 1 - maxp)
                cterm = done2 | (~can_max & ~can_min)
                need_exp = ~found & ~term & (child < 0)
                room = t.nnodes < N
                do_exp = need_exp & room
                new_id = t.nnodes
                widx = jnp.where(do_exp, new_id, N)
                wcur = jnp.where(do_exp, cur, N)
                t = t._replace(
                    states=_set_state(t.states, widx, st2),
                    nplayer=t.nplayer.at[widx].set(cplayer),
                    nterm=t.nterm.at[widx].set(cterm),
                    ndepth=t.ndepth.at[widx].set(_row(t.ndepth, cur) + 1),
                    acand=t.acand.at[widx].set(
                        sample_cands(st2, cplayer, kc2)),
                    achild=t.achild.at[wcur, slot].set(new_id),
                    nnodes=t.nnodes + do_exp.astype(jnp.int32))

                hop = ~found & ~term & ((child >= 0) | do_exp)
                pidx = jnp.where(hop, plen, D + 1)
                pn = pn.at[pidx].set(jnp.where(hop, cur, -1))
                ps = ps.at[pidx].set(slot)
                plen = plen + hop.astype(jnp.int32)

                leaf_now = (~found) & (term | do_exp
                                       | (need_exp & ~room))
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
                 path_n, path_s, jnp.int32(0), kd))

            v = playout(_get_state(tree.states, leaf), maxp, t0, kp)
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
        slot = jnp.argmax(tree.avis[0])
        best = _row(tree.acand[0], slot).astype(jnp.int32)
        act = arms_to_action(sp, best)
        return jnp.where(jnp.any(tree.avis[0] > 0), act,
                         jnp.zeros_like(act))

    return bot


# ======================================================================
# InformedNaiveMCTS / MLPSMCTS (naive-tree variants)

def informed_naive_mcts_bot(env: GridnetEnv, model, *,
                            model_playouts: bool = True, **kw):
    """InformedNaiveMCTS (ai/mcts/informedmcts/InformedNaiveMCTS.java):
    NaiveMCTS whose per-unit exploration follows a learned unit-action
    distribution; by default the playout policy is the model too (the
    Java default wires the same AIM-WR model as playout AI and tree bias,
    InformedNaiveMCTS.java:72-84).  ``model`` is a pretrained-XML path or
    a loaded ml.pretrained.PretrainedBayes (the reference ships these in
    data/bayesianmodels/pretrained/)."""
    from ..ml.pretrained import load_pretrained, make_prior_fn, \
        pretrained_bayes_bot
    if not hasattr(model, "log_prior"):
        model = load_pretrained(model, env)
    kw.setdefault("eps0", 0.4)
    kw.setdefault("eps_l", 0.3)
    if model_playouts and "rollout_bot" not in kw:
        kw["rollout_bot"] = pretrained_bayes_bot(env, model)
    return naive_mcts_bot(env, prior_fn=make_prior_fn(env, model), **kw)


def uct_unit_actions_bot(env: GridnetEnv, ucb_c: float = 0.05, **kw):
    """UCTUnitActions (ai/mcts/uct/UCTUnitActions.java): a UCT tree whose
    levels decide one unit at a time (first idle unit in board order) —
    per frame the root's most-visited single-unit action is played.
    Deeper default tree (Java MAX_TREE_DEPTH=10 *unit* decisions)."""
    kw.setdefault("eps0", 1.0)
    kw.setdefault("eps_g", 0.0)
    kw.setdefault("max_depth", 10)
    return naive_mcts_bot(env, local_policy="unit_uct", ucb_c=ucb_c, **kw)


def mlps_mcts_bot(env: GridnetEnv, ucb_c: float = 0.05, **kw):
    """MLPSMCTS (ai/mcts/mlps/MLPSMCTS.java): the naive tree with the
    per-unit UCB1 local rule (exploit + C*M*sqrt((M+1)*ln n / n_ij)) and
    no global-MAB step (eps0 = 1 forces local selection each descent,
    like MLPSNode.selectLeaf).  Divergence from the Java (documented):
    min nodes minimize the exploitation term — MLPSNode maximizes the
    raw mean at both node types, which reads as an upstream bug."""
    kw.setdefault("eps0", 1.0)
    kw.setdefault("eps_g", 0.0)
    return naive_mcts_bot(env, local_policy="ucb", ucb_c=ucb_c, **kw)
