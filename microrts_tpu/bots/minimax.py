"""Alpha-beta search considering durations: ABCD / IDABCD / RTMinimax.

TPU re-design of the reference minimax family (SURVEY.md §2.4,
ai/minimax/ABCD/ABCD.java, ai/minimax/RTMiniMax/RTMinimax.java +
IDRTMinimax.java).  The Java recursion over cloned GameStates becomes an
iterative depth-first search over a FIXED explicit stack: node i's state
is row i of a stacked State pytree, node expansion draws joint actions
lazily from the odometer enumerator (ops/enumerate.py = the exact
rts/PlayerActionGenerator walk), and one search step (draw-and-push or
finish-and-pop) is one trip of a jitted ``lax.while_loop`` — so whole
tournaments of minimax games batch with ``vmap``.

Semantics matched to the reference:

* node ownership: if both players can act, ABCD alternates the mover down
  the path (Churchill & Buro "alt", ABCD.java:134-144, param threaded as
  ``nextPlayerInSimultaneousNode``); RTMinimax always prefers maxplayer
  (RTMinimax.java:128-170); if neither can act the state fast-forwards
  with ``cycle`` without consuming depth (ABCD.java:188-193 — folded into
  child creation here);
* issue without re-validation (``cloneIssue``): enumerated actions are
  consistent by construction, so decode+issue is the same operation;
* alpha-beta with strict improvement (first-best kept, ABCD.java:155-163)
  and immediate cutoff on beta<=alpha;
* ABCD leaves (depth exhausted or terminal) run a both-sides scripted
  playout for ``playout_len`` ticks (default WorkerRush, ABCD.java:50 and
  :113-131) and evaluate SimpleSqrtEvaluationFunction3; RTMinimax leaves
  (``state.time >= t0 + lookahead``) evaluate directly
  (RTMinimax.java:120-127);
* the ID variants run the fixed deepening schedule and keep the deepest
  result — the jitted analog of the wall-clock iterative deepening of
  IDRTMinimax.java:118-163 / IDABCD.

Documented divergences (budget shape, not node semantics):

* total search work is a static ``node_budget`` of draw/pop steps (Java
  enumerates exhaustively); when the budget ends mid-search the best root
  move so far is returned, like a time cutoff — before any root child has
  fully evaluated, "best so far" is the first enumerated root action
  (anytime fallback; NONE-last ordering makes it a real move);
* stack depth is capped at ``stack_cap`` plies; deeper nodes evaluate as
  leaves (relevant only to RTMinimax with long lookaheads);
* enumeration order is cell-major/catalog order, so under a budget cutoff
  the explored prefix differs from Java's (the full sets are equal —
  tests/test_enumerate.py);
* units the search leaves idle get NONE(1) instead of NONE(8)
  (``defaultNONEduration``) — they re-plan next tick.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..engine.types import State
from ..env.gridnet import GridnetEnv
from ..ops.arms import arm_space, arms_to_action
from ..ops.enumerate import Odometer, make_enumerator
from ..ops.evaluation import simple_sqrt_eval3
from .scripted import worker_rush
from .treesearch import (_advance, _can_act, _get_state, _issue_player,
                         _make_playout, _row, _set_state, _stack_state)

VICTORY = jnp.float32(1e5)


def _make_dfs(env: GridnetEnv, *, alt: bool, max_depth: int,
              lookahead: Optional[int], stack_cap: int, node_budget: int,
              playout_len: int, playout_bot, eval_fn,
              randomized: bool = False):
    """Shared fixed-shape DFS alpha-beta.  ``lookahead=None`` cuts leaves
    by ply depth (ABCD); otherwise by game time (RTMinimax).
    ``randomized=True`` is Buro-style randomized alpha-beta
    (IDRTMinimaxRandomized.java:86-91): at SIMULTANEOUS nodes the mover
    is a coin flip instead of strict alternation — "the ONLY difference
    between this method and the standard alpha-beta".

    The returned bot also exposes ``bot.value_fn(state, player, key)``:
    the root's backed-up value (used by the randomized-root repeat
    harness, RTMiniMaxRandomizedRootNode)."""
    eng = env.engine
    H, W = env.h, env.w
    HW = H * W
    S = stack_cap
    sp_arm = arm_space(env)
    init_enum, next_action = make_enumerator(env)
    playout = _make_playout(env, playout_len, eval_fn, 1.0, playout_bot)

    def run(state: State, maxp, key):
        t0 = state.time

        def entry(st, level, nextsim_in, k):
            """Node-entry processing: mover selection, leaf handling.
            Returns per-level row values to write at ``level``."""
            can_max = _can_act(st, maxp)
            can_min = _can_act(st, 1 - maxp)
            both = can_max & can_min
            if alt and randomized:
                k, km = jax.random.split(k)
                coin = jax.random.randint(km, (), 0, 2)
                mover = jnp.where(both, coin,
                                  jnp.where(can_max, maxp, 1 - maxp))
                nextsim = nextsim_in
            elif alt:
                mover = jnp.where(both, nextsim_in,
                                  jnp.where(can_max, maxp, 1 - maxp))
                nextsim = jnp.where(both, 1 - nextsim_in, nextsim_in)
            else:
                mover = jnp.where(can_max, maxp, 1 - maxp)
                nextsim = nextsim_in
            term = eng.gameover(st) | ~(can_max | can_min)
            if lookahead is None:
                cut = level >= max_depth
            else:
                cut = st.time >= t0 + lookahead
            leaf = term | cut | (level >= S - 1)
            od, ctx = init_enum(st, mover)
            od = Odometer(choice=od.choice, more=od.more & ~leaf)
            v_leaf = jax.lax.cond(
                leaf, lambda kk: playout(st, maxp, t0, kk),
                lambda kk: jnp.float32(0.0), k)
            is_max = mover == maxp
            best0 = jnp.where(leaf, v_leaf,
                              jnp.where(is_max, -VICTORY, VICTORY))
            return od, ctx, mover, nextsim, best0

        # ---- stacked storage, row S = write scratch --------------------
        key, k0 = jax.random.split(key)
        od0, ctx0, mover0, nextsim0, best00 = entry(
            state, jnp.int32(0), maxp, k0)
        states = _set_state(_stack_state(state, S + 1), 0, state)
        ochoice = jnp.zeros((S + 1, HW), jnp.int32).at[0].set(od0.choice)
        omore = jnp.zeros(S + 1, bool).at[0].set(od0.more)
        ctxs = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (S + 1,) + x.shape)
            .astype(x.dtype), ctx0)
        alpha = jnp.full(S + 1, -VICTORY).at[0].set(-VICTORY)
        beta = jnp.full(S + 1, VICTORY)
        best = jnp.zeros(S + 1, jnp.float32).at[0].set(best00)
        mover_a = jnp.zeros(S + 1, jnp.int32).at[0].set(mover0)
        nextsim_a = jnp.zeros(S + 1, jnp.int32).at[0].set(nextsim0)
        down_arms = jnp.full((S + 1, H, W), -1, jnp.int32)
        root_arms = jnp.full((H, W), -1, jnp.int32)
        root_set = jnp.bool_(False)   # a root child fully evaluated

        def cond(c):
            return (~c[-2]) & (c[-1] < node_budget)

        def body(c):
            (states, ochoice, omore, ctxs, alpha, beta, best, mover_a,
             nextsim_a, down_arms, root_arms, root_set, sp, key, done,
             it) = c
            L = sp
            prune = _row(beta, L) <= _row(alpha, L)
            finish = ~_row(omore, L) | prune

            def pop(c):
                (states, ochoice, omore, ctxs, alpha, beta, best, mover_a,
                 nextsim_a, down_arms, root_arms, root_set, sp, key, done,
                 it) = c
                v = _row(best, L)
                at_root = L == 0
                P = jnp.maximum(L - 1, 0)
                is_max = _row(mover_a, P) == maxp
                better = jnp.where(is_max, v > _row(best, P),
                                   v < _row(best, P)) & ~at_root
                widx = jnp.where(better, P, S)
                best = best.at[widx].set(v)
                root_arms = jnp.where(
                    better & (P == 0),
                    _row(down_arms, 0), root_arms)
                root_set = root_set | (better & (P == 0) & ~at_root)
                alpha = alpha.at[jnp.where(is_max & ~at_root, P, S)].set(
                    jnp.maximum(_row(alpha, P), v))
                beta = beta.at[jnp.where(is_max | at_root, S, P)].set(
                    jnp.minimum(_row(beta, P), v))
                return (states, ochoice, omore, ctxs, alpha, beta, best,
                        mover_a, nextsim_a, down_arms, root_arms, root_set,
                        P, key, done | at_root, it + 1)

            def draw(c):
                (states, ochoice, omore, ctxs, alpha, beta, best, mover_a,
                 nextsim_a, down_arms, root_arms, root_set, sp, key, done,
                 it) = c
                od_L = Odometer(choice=_row(ochoice, L),
                                more=_row(omore, L))
                ctx_L = jax.tree.map(lambda x: _row(x, L), ctxs)
                odn, arms, valid = next_action(od_L, ctx_L)
                ochoice = ochoice.at[L].set(odn.choice)
                omore = omore.at[L].set(odn.more)

                def push(c):
                    (states, ochoice, omore, ctxs, alpha, beta, best,
                     mover_a, nextsim_a, down_arms, root_arms, root_set,
                     sp, key, done, it) = c
                    # anytime fallback: before any root child completes,
                    # "best so far" is the first enumerated root action
                    root_arms = jnp.where(
                        (L == 0) & ~root_set, arms.reshape(H, W), root_arms)
                    key, kE = jax.random.split(key)
                    st = _get_state(states, L)
                    st1 = _issue_player(
                        env, st, arms_to_action(sp_arm, arms.reshape(H, W)),
                        _row(mover_a, L))
                    st2, _ = _advance(env, st1)
                    C = L + 1
                    odC, ctxC, moverC, nextsimC, bestC = entry(
                        st2, C, _row(nextsim_a, L), kE)
                    states = _set_state(states, C, st2)
                    ochoice = ochoice.at[C].set(odC.choice)
                    omore = omore.at[C].set(odC.more)
                    ctxs = jax.tree.map(
                        lambda x, v: jax.lax.dynamic_update_index_in_dim(
                            x, v.astype(x.dtype), C, 0), ctxs, ctxC)
                    alpha = alpha.at[C].set(_row(alpha, L))
                    beta = beta.at[C].set(_row(beta, L))
                    best = best.at[C].set(bestC)
                    mover_a = mover_a.at[C].set(moverC)
                    nextsim_a = nextsim_a.at[C].set(nextsimC)
                    down_arms = down_arms.at[L].set(arms.reshape(H, W))
                    return (states, ochoice, omore, ctxs, alpha, beta,
                            best, mover_a, nextsim_a, down_arms, root_arms,
                            root_set, C, key, done, it + 1)

                c2 = (states, ochoice, omore, ctxs, alpha, beta, best,
                      mover_a, nextsim_a, down_arms, root_arms, root_set,
                      sp, key, done, it + 1)
                return jax.lax.cond(valid, push, lambda cc: cc, c2)

            return jax.lax.cond(finish, pop, draw, c)

        key, kF = jax.random.split(key)
        c = (states, ochoice, omore, ctxs, alpha, beta, best, mover_a,
             nextsim_a, down_arms, root_arms, root_set, jnp.int32(0), key,
             jnp.bool_(False), jnp.int32(0))
        c = jax.lax.while_loop(cond, body, c)
        root_arms, root_set_f, root_value = c[10], c[11], _row(c[6], 0)

        act = arms_to_action(sp_arm, root_arms)
        if playout_bot is not None:
            # Budget fallback: Java ABCD has NO node cap (it completes
            # the full depth every move, ABCD.java:105-193); under a
            # real-time node budget SOMETHING must be played when no
            # root child finished evaluating — play the bot's own
            # playout policy (the same default-policy prior that seeds
            # sampled_abcd's candidate 0) instead of an arbitrary first
            # enumeration.  Documented divergence.
            fb = playout_bot(state, maxp, kF)
            act = jnp.where(root_set_f, act, fb)
        can = _can_act(state, maxp) & ~eng.gameover(state)
        return jnp.where(can, act, jnp.zeros_like(act)), root_value

    def bot(state: State, player, key):
        return run(state, jnp.int32(player), key)[0]

    bot.value_fn = lambda state, player, key: run(
        state, jnp.int32(player), key)[1]
    return bot


# ----------------------------------------------------------------------
def sampled_abcd_bot(env: GridnetEnv, k_moves: int = 8,
                     playout_len: int = 100,
                     playout_bot: Optional[Callable] = None,
                     eval_fn: Optional[Callable] = None,
                     n_decisions: Optional[int] = None):
    """ABCD's search effort re-shaped for SIMD hardware: ONE simultaneous
    ply of ``k_moves`` sampled consistent joint actions per side, the
    K x K durative children each rolled out with the Java-default playout
    policy (WorkerRush both sides, ABCD.java:50, :113-131) for the
    Java-default 100 ticks — ALL K^2 playouts advance as one vmapped
    batch — and maximin backup with first-tie-break (:155-163).

    Why this shape: the exact fixed-stack DFS (``abcd_bot``) reproduces
    the reference's node semantics (mover alternation, alpha-beta,
    odometer enumeration) and stays the parity path, but under ``vmap``
    its leaf playout executes on EVERY while-loop trip in every lane
    (SIMD evaluates both sides of ``lax.cond``), so the budget the Java
    bot actually plays at (depth 4, 100-tick playouts, unbounded nodes)
    costs node_budget x playout_len sequential engine ticks per move and
    cannot batch.  Collapsing the alternation to one simultaneous ply and
    paying playout_len ONCE across the whole K^2 matrix keeps the same
    move-quality signal (position after scripted continuation, evaluated
    by SimpleSqrtEval3) at 1/node_budget of the sequential depth.
    Candidate 0 of each side is the playout policy's own action (the
    anytime fallback the DFS also uses); the rest are RandomBiasedAI-
    weighted legal samples — the sampled counterpart of the odometer's
    move ordering."""
    ecfg = env.cfg.engine
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    if playout_bot is None:
        playout_bot = worker_rush(env)
    from .scripted import random_bot
    sampler = random_bot(env, 5.0)
    K = k_moves
    eng = env.engine
    cont = _make_playout(env, playout_len, eval_fn, 1.0, playout_bot,
                         n_decisions=n_decisions)

    def bot(state: State, player, key):
        p = jnp.int32(player)
        kA, kB, kP = jax.random.split(key, 3)

        def cands(pl, keys):
            a_script = playout_bot(state, pl, keys[0])
            a_rand = jax.vmap(lambda k: sampler(state, pl, k))(keys[1:])
            return jnp.concatenate([a_script[None], a_rand], axis=0)

        mine = cands(p, jax.random.split(kA, K))      # [K, H, W, 7]
        theirs = cands(1 - p, jax.random.split(kB, K))

        def leaf(a_me, a_op, k):
            a0 = jnp.where(p == 0, a_me, a_op)
            a1 = jnp.where(p == 0, a_op, a_me)
            s1, _, _ = env.step(state, a0, a1)
            return cont(s1, p, state.time, k)

        keys = jax.random.split(kP, K * K).reshape(K, K, -1)
        V = jax.vmap(lambda am, krow: jax.vmap(
            lambda ao, kk: leaf(am, ao, kk))(theirs, krow))(mine, keys)
        best = jnp.argmax(jnp.min(V, axis=1))
        act = mine[0]
        for i in range(1, K):   # unrolled select (gathers are slow on TPU)
            act = jnp.where(best == i, mine[i], act)
        can = _can_act(state, p) & ~eng.gameover(state)
        return jnp.where(can, act, jnp.zeros_like(act))

    return bot


def abcd_bot(env: GridnetEnv, max_depth: int = 4, playout_len: int = 100,
             node_budget: int = 512,
             playout_bot: Optional[Callable] = None,
             eval_fn: Optional[Callable] = None):
    """ABCD — alpha-beta considering durations with the "alt" tree
    alteration (ai/minimax/ABCD/ABCD.java:86-193).  Defaults mirror Java:
    depth 4, WorkerRush playouts of 100 ticks, SimpleSqrtEval3."""
    ecfg = env.cfg.engine
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    if playout_bot is None:
        playout_bot = worker_rush(env)
    return _make_dfs(env, alt=True, max_depth=max_depth, lookahead=None,
                     stack_cap=max_depth + 1, node_budget=node_budget,
                     playout_len=playout_len, playout_bot=playout_bot,
                     eval_fn=eval_fn)


def id_abcd_bot(env: GridnetEnv, depths=(1, 2, 3, 4),
                playout_len: int = 100, node_budget: int = 512,
                playout_bot: Optional[Callable] = None,
                eval_fn: Optional[Callable] = None):
    """IDABCD — iterative deepening over a fixed depth schedule; the
    deepest search's move wins (jitted analog of the wall-clock deepening
    in ai/minimax/ABCD/IDABCD.java)."""
    bots = [abcd_bot(env, d, playout_len, node_budget, playout_bot,
                     eval_fn) for d in depths]

    def bot(state, player, key):
        act = None
        for i, b in enumerate(bots):
            act = b(state, player, jax.random.fold_in(key, i))
        return act

    return bot


def rt_minimax_bot(env: GridnetEnv, lookahead: int = 50,
                   stack_cap: int = 12, node_budget: int = 512,
                   eval_fn: Optional[Callable] = None):
    """RTMinimax — real-time alpha-beta to a game-time horizon, leaves
    evaluated directly (ai/minimax/RTMiniMax/RTMinimax.java:97-180)."""
    ecfg = env.cfg.engine
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    return _make_dfs(env, alt=False, max_depth=0, lookahead=lookahead,
                     stack_cap=stack_cap, node_budget=node_budget,
                     playout_len=0, playout_bot=None, eval_fn=eval_fn)


def idrt_minimax_bot(env: GridnetEnv, lookaheads=(25, 50, 100),
                     stack_cap: int = 12, node_budget: int = 512,
                     eval_fn: Optional[Callable] = None):
    """IDRTMinimax — deepening over a fixed lookahead schedule
    (ai/minimax/RTMiniMax/IDRTMinimax.java:118-163)."""
    bots = [rt_minimax_bot(env, la, stack_cap, node_budget, eval_fn)
            for la in lookaheads]

    def bot(state, player, key):
        act = None
        for i, b in enumerate(bots):
            act = b(state, player, jax.random.fold_in(key, i))
        return act

    return bot


def idrt_minimax_randomized_bot(env: GridnetEnv, k_moves: int = 8,
                                repeats: int = 8, lookahead: int = 25,
                                stack_cap: int = 10,
                                node_budget: int = 96,
                                eval_fn: Optional[Callable] = None):
    """IDRTMinimaxRandomized (ai/minimax/RTMiniMax/IDRTMinimaxRandomized
    .java) — Michael Buro's randomized alpha-beta applied to RTMM:

    * below the root, SIMULTANEOUS nodes pick their mover by coin flip
      instead of strict ordering (:86-91 — "the ONLY difference");
    * each root action is searched ``repeats`` times and scored
      ``mean - stddev`` over the repeats (:139-151), max score wins with
      the first-tie-break (:159-162).

    TPU shape: the first ``k_moves`` odometer-enumerated root actions
    (the Java root's PlayerActionGenerator order) are each evaluated by
    ``repeats`` coin-flip DFS runs — the whole K x R matrix is ONE
    vmapped batch of the shared fixed-stack DFS (``value_fn``), so the
    randomized repeats ride batch width, not wall clock."""
    ecfg = env.cfg.engine
    if eval_fn is None:
        eval_fn = lambda s, p: simple_sqrt_eval3(s, p, ecfg)
    H, W = env.h, env.w
    sp = arm_space(env)
    init_enum, next_action = make_enumerator(env)
    inner = _make_dfs(env, alt=True, max_depth=0, lookahead=lookahead,
                      stack_cap=stack_cap, node_budget=node_budget,
                      playout_len=0, playout_bot=None, eval_fn=eval_fn,
                      randomized=True)
    K = k_moves

    def bot(state: State, player, key):
        maxp = jnp.int32(player)
        od0, ctx = init_enum(state, maxp)

        def draw(od, _):
            od2, arms, valid = next_action(od, ctx)
            return od2, (arms.reshape(H, W), valid)

        _, (arms_k, valid_k) = jax.lax.scan(draw, od0, None, length=K)

        def score_one(arms, valid, k):
            st1 = _issue_player(env, state, arms_to_action(sp, arms), maxp)
            st2, done2 = _advance(env, st1)
            vs = jax.vmap(lambda kk: inner.value_fn(st2, player, kk))(
                jax.random.split(k, repeats))
            vs = jnp.where(done2, eval_fn(st2, maxp), vs)
            score = jnp.mean(vs) - jnp.std(vs)
            return jnp.where(valid, score, -jnp.inf)

        scores = jax.vmap(score_one)(
            arms_k, valid_k, jax.random.split(key, K))
        best = jnp.argmax(scores)
        act = arms_to_action(sp, arms_k[0])
        for i in range(1, K):    # unrolled select (gathers are slow)
            act = jnp.where(best == i, arms_to_action(sp, arms_k[i]), act)
        can = _can_act(state, maxp) & ~env.engine.gameover(state) \
            & jnp.any(valid_k)
        return jnp.where(can, act, jnp.zeros_like(act))

    return bot
