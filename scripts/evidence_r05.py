"""Round-5 evidence: the recorded search-zoo ledger (VERDICT r4 items
1, 4, 5, 6, 7).

Sections (each appends to RESULTS.md as it finishes; run each in its own
``timeout``-wrapped process on the tunneled TPU — CLAUDE.md wedge
protocol):

  A. NaiveMCTS vs MonteCarlo vs NaiveSampling HEAD-TO-HEAD pairs at
     equal playout-count budget (48 playouts x 100 ticks / move) — the
     Java ITERATIONS_BUDGET framing (NaiveMCTS.java:25-145).
  B. search bots vs RandomBiasedAI, 8 games each side — the full
     _bot_table, including the EXACT duration-aware ABCD
     (ABCD.java:105-193) and SampledABCD separately, plus SCVAdaptive.
  E. ContinuingNaiveMCTS (tree reuse, ContinuingAI.java:11-149) vs
     stateless NaiveMCTS at equal per-move budget.
  W. equal WALL-CLOCK budget head-to-head — the Java TIME_BUDGET
     framing (Tournament.java:69-98, canonical 100 ms/move): each bot's
     static budget is calibrated on-device to the ms target
     (utils/budget.calibrate_budget), then the fitted bots play.  The
     fitted budgets and measured ms/move are recorded (the over-budget
     accounting analog for compiled bots, whose per-move cost is fixed
     at compile time and cannot crash or stall mid-move).
  S. SCVAdaptive (battle-statistics pool selection, SCV.java:115-175)
     vs uniform-pool SCV, head-to-head on two map sizes.

Run: ``python scripts/evidence_r05.py [--cpu] [--section A B E W S]
[--append] [--bots NaiveMCTS ...] [--games 8] [--neval N]``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HEADER = """# Recorded tournament evidence (round 5)

Reproduce with `python scripts/evidence_r05.py`.  Winners computed by
`eval.tournament` (decision-frame game loop, chunked batched device
programs); w/t/l counted over both playing positions; ties include
max-cycle cutoffs.  Budgets are static (playouts x playout ticks x
parallel evals); exact constructors in scripts/evidence_r05.py.
All playouts use the decision-point fast-forward with Java bot-path
NONE(10) idling (ops/playout.py).
"""


def _emit(out, text):
    print(text, flush=True)
    with open(out, "a") as f:
        f.write(text + "\n")


def _env(map_rel="maps/8x8/basesWorkers8x8.xml"):
    from microrts_tpu.env.gridnet import GridnetEnv
    from microrts_tpu.utils.assets import asset_path
    return GridnetEnv(asset_path(map_rel))


def _wtl(w0, w1):
    import numpy as np
    wins = int((np.asarray(w0) == 0).sum() + (np.asarray(w1) == 1).sum())
    loss = int((np.asarray(w0) == 1).sum() + (np.asarray(w1) == 0).sum())
    n = len(w0) + len(w1)
    return wins, n - wins - loss, loss


def _precompile(env, bot, label=""):
    """Wedge mitigation: compile jax.jit(bot) ALONE (one call) before
    any tournament scan touches it (CLAUDE.md protocol)."""
    import jax
    t0 = time.time()
    s = env.reset(jax.random.PRNGKey(0))
    jax.block_until_ready(
        jax.jit(bot, static_argnums=1)(s, 0, jax.random.PRNGKey(1)))
    print(f"  [precompiled {label}: {time.time() - t0:.0f}s]", flush=True)


def section_a(out, games=8, chunk=None, neval=1, pairs=None,
              no_header=False):
    """NaiveMCTS vs flat searchers at matched playout-count budget.
    ``pairs`` (e.g. ["NaiveMCTS:NaiveSampling"]) restricts to named
    pairings so each can run in its own timeout'ed process — the tree
    bots SATURATE the chip (lanes are compute-bound, not width-free),
    so a pairing at 8 games/side costs ~1 h wall on the tunnel."""
    from microrts_tpu.bots.search import monte_carlo_bot, naive_sampling_bot
    from microrts_tpu.bots.treesearch import naive_mcts_bot
    from microrts_tpu.eval.tournament import play_matches_both

    env = _env()
    # equal budget: 48 playouts x 100 ticks per move (x neval parallel
    # evaluations per leaf for EVERY bot when --neval > 1)
    mk = {
        "NaiveMCTS": lambda: naive_mcts_bot(env, n_playouts=48,
                                            max_nodes=64, max_children=12,
                                            max_depth=6, playout_len=100,
                                            n_eval=neval),
        "MonteCarlo": lambda: monte_carlo_bot(env, n_candidates=24,
                                              playout_len=100,
                                              n_eval=2 * neval),
        "NaiveSampling": lambda: naive_sampling_bot(env, n_rounds=48,
                                                    playout_len=100),
    }
    # per-dispatch budget: seq playout ticks per move (CLAUDE.md <50k)
    seq = {"NaiveMCTS": 4800, "MonteCarlo": 100, "NaiveSampling": 4800}
    all_pairs = [("NaiveMCTS", "MonteCarlo"),
                 ("NaiveMCTS", "NaiveSampling"),
                 ("MonteCarlo", "NaiveSampling")]
    if pairs:
        want = {tuple(p.split(":")) for p in pairs}
        all_pairs = [p for p in all_pairs if p in want]
    t_all = time.time()
    tag = f" x{neval} parallel evals" if neval > 1 else ""
    if not no_header:
        _emit(out, f"\n## A. NaiveMCTS vs playout searchers, "
                   f"head-to-head pairs (basesWorkers8x8, equal budget: "
                   f"48 playouts x 100 ticks/move{tag}, {games} games "
                   f"each side, max 2000 cycles)\n")
        _emit(out, "| pairing | left wins | ties | right wins |")
        _emit(out, "|---|---|---|---|")
    score = {k: 0.0 for k in mk}
    for ln, rn in all_pairs:
        t0 = time.time()
        bl, br = mk[ln](), mk[rn]()
        ch = chunk or max(1, min(8, 45000 // (seq[ln] + seq[rn])))
        _precompile(env, bl, ln)
        _precompile(env, br, rn)
        w0, w1 = play_matches_both(env, bl, br, n_games=games,
                                   max_cycles=2000, seed=17, chunk=ch)
        w, t, l = _wtl(w0, w1)
        score[ln] += w + 0.5 * t
        score[rn] += l + 0.5 * t
        _emit(out, f"| {ln} vs {rn} | {w} | {t} | {l} |")
        print(f"  [{ln} vs {rn}: {time.time() - t0:.0f}s, chunk {ch}]",
              flush=True)
    if not pairs:
        rank = sorted(score, key=lambda k: -score[k])
        _emit(out, "\nranking: " + ", ".join(
            f"{k} ({score[k]:.1f})" for k in rank)
            + f"  ({time.time() - t_all:.0f}s)")


def _bot_table(env):
    """Section-B pool with fast-forward budgets."""
    from microrts_tpu.bots import minimax as MM
    from microrts_tpu.bots import portfolio as PF
    from microrts_tpu.bots import treesearch as TS
    from microrts_tpu.bots.lsi import lsi_bot
    from microrts_tpu.bots.puppet import puppet_ab_bot
    from microrts_tpu.bots.search import monte_carlo_bot
    from microrts_tpu.config import make_bot
    return {
        # the EXACT duration-aware alpha-beta (ABCD.java semantics);
        # every while-trip pays its leaf playout under vmap, so the node
        # budget is the wall cost driver
        "ABCD": (lambda: MM.abcd_bot(env, max_depth=2, playout_len=50,
                                     node_budget=96),
                 "exact DFS: depth 2, 96 nodes, 50-tick playout leaves"),
        "SampledABCD": (lambda: MM.sampled_abcd_bot(env),
                        "K=8 joint moves, 8x8 batched 100-tick playouts, "
                        "maximin"),
        "PGSAI": (lambda: PF.pgs_bot(env, lookahead=64, slots=6,
                                     responses=0),
                  "lookahead 64, 6 slots, 0 response rounds"),
        "UCT": (lambda: TS.uct_tree_bot(env, n_playouts=32, max_nodes=48,
                                        n_candidates=6, playout_len=100,
                                        n_eval=2),
                "32 iters x 100 ticks x 2 parallel evals"),
        "NaiveMCTS": (lambda: TS.naive_mcts_bot(
            env, n_playouts=48, max_nodes=64, max_children=12, max_depth=6,
            playout_len=100),
            "48 iters x 100 ticks"),
        "PortfolioAI": (lambda: PF.portfolio_ai_bot(env, lookahead=100),
                        "4 scripts, lookahead 100"),
        "MonteCarlo": (lambda: monte_carlo_bot(env, n_candidates=32,
                                               playout_len=100, n_eval=4),
                       "32 candidates x 100 ticks x 4 parallel evals"),
        "LSI": (lambda: lsi_bot(env, n_probes=24, n_candidates=8,
                                playout_len=100),
                "24 probes, 8 candidates, 100-tick playouts"),
        "RTMinimax": (lambda: MM.rt_minimax_bot(env, lookahead=25,
                                                node_budget=160),
                      "exact DFS, lookahead 25, 160 nodes"),
        "PuppetNoPlan": (lambda: puppet_ab_bot(env), "default"),
        "SCV": (lambda: make_bot("SCV", env), "default 4-strategy pool"),
        "SCVAdaptive": (lambda: make_bot("SCVAdaptive", env),
                        "battle-stats pool selection, 12-bot stack"),
    }


def section_b(out, only=None, games=8, chunk_override=None):
    from microrts_tpu.config import make_bot
    from microrts_tpu.eval.tournament import play_matches_both

    env = _env()
    rb = make_bot("RandomBiasedAI", env)
    bots = _bot_table(env)
    if only:
        bots = {k: v for k, v in bots.items() if k in only}
    _emit(out, f"\n## B. Search bots vs RandomBiasedAI (basesWorkers8x8, "
               f"{games} games each side, max 2000 cycles)\n")
    _emit(out, "| bot | budget | wins | ties | losses | win% |")
    _emit(out, "|---|---|---|---|---|---|")
    for name, (mk, budget) in bots.items():
        t0 = time.time()
        try:
            bot = mk()
            chunk = chunk_override or (4 if name in ("ABCD", "RTMinimax")
                                       else 8)
            _precompile(env, bot, name)
            w0, w1 = play_matches_both(env, bot, rb, n_games=games,
                                       max_cycles=2000, seed=5,
                                       chunk=chunk)
            w, t, l = _wtl(w0, w1)
            n = 2 * games
            _emit(out, f"| {name} | {budget} | {w} | {t} | {l} | "
                       f"{100.0 * w / n:.0f}% |")
        except Exception as e:
            _emit(out, f"| {name} | {budget} | - | - | - | "
                       f"run failed: {type(e).__name__} |")
            traceback.print_exc()
        print(f"  [{name}: {time.time() - t0:.0f}s]", flush=True)


def section_e(out, games=8):
    """Tree reuse must measurably beat the stateless tree at equal
    per-move budget (ContinuingAI.java:11-149)."""
    from microrts_tpu.bots.believestate import (play_matches_stateful,
                                                stateless)
    from microrts_tpu.bots.treesearch import (naive_mcts_bot,
                                              naive_mcts_continuing)

    env = _env()
    kw = dict(n_playouts=24, max_nodes=96, max_children=12, max_depth=6,
              playout_len=100)
    cont = naive_mcts_continuing(env, **kw)
    stat = stateless(naive_mcts_bot(env, **kw))
    t0 = time.time()
    ws = []
    for seed, (b0, b1) in enumerate([(cont, stat), (stat, cont)]):
        w = play_matches_stateful(env, b0, b1, n_games=games,
                                  max_cycles=2000, seed=23 + seed,
                                  chunk=8)
        ws.append(w)
    # ws[0] lanes have cont as p0, ws[1] lanes have cont as p1
    import numpy as np
    wins = int((np.asarray(ws[0]) == 0).sum()
               + (np.asarray(ws[1]) == 1).sum())
    loss = int((np.asarray(ws[0]) == 1).sum()
               + (np.asarray(ws[1]) == 0).sum())
    n = 2 * games
    _emit(out, f"\n## E. Tree reuse: ContinuingNaiveMCTS vs stateless "
               f"NaiveMCTS (equal budget 24 iters x 100 ticks/move, "
               f"basesWorkers8x8, {n} games, max 2000 cycles, "
               f"{time.time() - t0:.0f}s)\n")
    _emit(out, f"ContinuingNaiveMCTS wins {wins}, losses {loss}, "
               f"draws {n - wins - loss}.")


def section_w(out, games=8, budget_ms=100.0):
    """Equal WALL-CLOCK per-move budget: the Java TIME_BUDGET framing.
    Calibrate each bot's static budget to ~budget_ms per compiled move
    on THIS device, then play head-to-head."""
    import jax
    from microrts_tpu.bots.search import monte_carlo_bot
    from microrts_tpu.bots.treesearch import naive_mcts_bot
    from microrts_tpu.eval.tournament import play_matches_both
    from microrts_tpu.utils.budget import calibrate_budget, measure_move_ms

    env = _env()
    t_all = time.time()
    factories = {
        "NaiveMCTS": lambda n: naive_mcts_bot(
            env, n_playouts=n, max_nodes=max(2 * n, 16), max_children=12,
            max_depth=6, playout_len=100, n_eval=4),
        "MonteCarlo": lambda n: monte_carlo_bot(
            env, n_candidates=32, playout_len=100, n_eval=max(n // 8, 1)),
        "NaiveSampling": None,  # set below (import here keeps top light)
    }
    from microrts_tpu.bots.search import naive_sampling_bot
    factories["NaiveSampling"] = lambda n: naive_sampling_bot(
        env, n_rounds=n, playout_len=100)
    ladders = {"NaiveMCTS": (4, 8, 16, 32, 64, 128),
               "MonteCarlo": (8, 16, 32, 64, 128, 256),
               "NaiveSampling": (4, 8, 16, 32, 64, 128)}
    fitted, ms = {}, {}
    for name, fac in factories.items():
        n = calibrate_budget(env, fac, budget_ms,
                             candidates=ladders[name])
        fitted[name] = n
        ms[name] = measure_move_ms(env, fac(n))
    _emit(out, f"\n## W. Equal wall-clock budget ({budget_ms:.0f} ms/"
               f"move, TIME_BUDGET framing of Tournament.java:69-98; "
               f"budgets calibrated per bot on this device)\n")
    _emit(out, "| bot | fitted static budget | measured ms/move |")
    _emit(out, "|---|---|---|")
    for name in factories:
        _emit(out, f"| {name} | {fitted[name]} | {ms[name]:.0f} |")
    _emit(out, "\nNote: a compiled bot's per-move cost is FIXED at "
               "compile time — it cannot exceed its calibrated budget "
               "mid-game, so the reference's over-budget forfeit rule "
               "(Tournament.java:127-150) has nothing to fire on; the "
               "measured ms/move above IS the accounting.  Measured "
               "per-move wall includes the tunnel's ~26-50 ms dispatch "
               "floor.\n")
    _emit(out, "| pairing | left wins | ties | right wins |")
    _emit(out, "|---|---|---|---|")
    pairs = [("NaiveMCTS", "MonteCarlo"), ("NaiveMCTS", "NaiveSampling"),
             ("MonteCarlo", "NaiveSampling")]
    score = {k: 0.0 for k in factories}
    for ln, rn in pairs:
        t0 = time.time()
        bl, br = factories[ln](fitted[ln]), factories[rn](fitted[rn])
        _precompile(env, bl, ln)
        _precompile(env, br, rn)
        w0, w1 = play_matches_both(env, bl, br, n_games=games,
                                   max_cycles=2000, seed=31, chunk=4)
        w, t, l = _wtl(w0, w1)
        score[ln] += w + 0.5 * t
        score[rn] += l + 0.5 * t
        _emit(out, f"| {ln} vs {rn} | {w} | {t} | {l} |")
        print(f"  [{ln} vs {rn}: {time.time() - t0:.0f}s]", flush=True)
    rank = sorted(score, key=lambda k: -score[k])
    _emit(out, "\nranking: " + ", ".join(
        f"{k} ({score[k]:.1f})" for k in rank)
        + f"  ({time.time() - t_all:.0f}s)")


def section_s(out, games=8):
    """SCVAdaptive (battle-stats pool selection) vs uniform-pool SCV."""
    from microrts_tpu.bots.scv import scv_bot
    from microrts_tpu.eval.tournament import play_matches_both

    for map_rel, label in (("maps/8x8/basesWorkers8x8.xml", "8x8"),
                           ("maps/16x16/basesWorkers16x16.xml", "16x16")):
        env = _env(map_rel)
        t0 = time.time()
        ada = scv_bot(env, adaptive=True)
        uni = scv_bot(env)
        _precompile(env, ada, f"SCVAdaptive/{label}")
        _precompile(env, uni, f"SCV/{label}")
        w0, w1 = play_matches_both(env, ada, uni, n_games=games,
                                   max_cycles=3000, seed=41, chunk=16)
        w, t, l = _wtl(w0, w1)
        _emit(out, f"\n## S/{label}. SCVAdaptive vs uniform-pool SCV "
                   f"(basesWorkers{label}, {2 * games} games, max 3000 "
                   f"cycles, {time.time() - t0:.0f}s)\n")
        _emit(out, f"SCVAdaptive wins {w}, losses {l}, draws {t}.")


def section_p(out):
    """The Puppet transposition-table question (VERDICT r4 item 8,
    TranspositionTable.java / CacheTable.java): measure what a TT could
    actually deduplicate in the TPU design.

    PuppetNoPlan's depth-2 search IS an exhaustive K x K playout matrix
    — each (my combo, their combo) leaf is simulated exactly once per
    move, so within-search re-simulation is structurally zero; the MCTS
    variant stores every expanded state in its arrays-of-nodes tree, so
    re-VISITS descend to stored children without re-simulation (the
    tree is the transposition table).  The only remaining dedup a Java-
    style state-hash TT could buy: distinct combo pairs converging to
    the IDENTICAL simulated end state.  This section counts those
    collisions over real decision states."""
    import jax
    import numpy as np
    from microrts_tpu.bots.puppet import puppet_combos
    from microrts_tpu.bots.portfolio import _playout_two
    from microrts_tpu.ops.evaluation import simple_sqrt_eval3
    from microrts_tpu.ops.playout import run_playout
    from microrts_tpu.bots.scripted import light_rush, worker_rush

    env = _env()
    _, scripts = puppet_combos(env)
    K = len(scripts)
    branches = [(lambda b: lambda s, p, k: b(s, p, k))(b)
                for b in scripts]
    t_all = time.time()

    import jax.numpy as jnp

    @jax.jit
    def endpoints(state, key):
        """[K, K] stacked end states of the AB leaf matrix."""
        def pair(i, j, k):
            me = lambda s, kk: jax.lax.switch(i, branches, s, 0, kk)
            op = lambda s, kk: jax.lax.switch(j, branches, s, 1, kk)
            def act2(s, kk):
                k0, k1 = jax.random.split(kk)
                return me(s, k0), op(s, k1)
            sf, _ = run_playout(env, act2, state, k, 100, 25)
            return sf
        ii, jj = jnp.meshgrid(jnp.arange(K), jnp.arange(K),
                              indexing="ij")
        keys = jax.random.split(key, K * K).reshape(K, K, -1)
        return jax.vmap(jax.vmap(pair))(ii, jj, keys)

    wr, lr = worker_rush(env), light_rush(env)
    s = env.reset(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(4)
    rows = []
    for t_probe in range(4):
        ends = endpoints(s, jax.random.fold_in(key, t_probe))
        # hash each end state's defining planes
        hs = set()
        for i in range(K):
            for j in range(K):
                leaf = jax.tree.map(lambda x: np.asarray(x[i, j]), ends)
                hs.add(hash((leaf.utype.tobytes(), leaf.owner.tobytes(),
                             leaf.hp.tobytes(), leaf.busy.tobytes(),
                             int(leaf.time))))
        rows.append((int(s.time), K * K, len(hs)))

        # advance ~150 ticks of real rush-vs-rush to the next probe state
        @jax.jit
        def adv(s, k):
            def body(c, _):
                s, k = c
                k, k0, k1 = jax.random.split(k, 3)
                s2, _, _ = env.step(s, wr(s, 0, k0), lr(s, 1, k1))
                return (s2, k), None
            (s, _), _ = jax.lax.scan(body, (s, k), None, length=150)
            return s
        s = adv(s, jax.random.fold_in(key, 100 + t_probe))
    _emit(out, f"\n## P. Puppet transposition-table measurement "
               f"(VERDICT r4 item 8; {time.time() - t_all:.0f}s)\n")
    _emit(out, "Within one PuppetNoPlan move the K x K leaf matrix "
               "simulates each combo pair exactly once (no revisits to "
               "dedup); PuppetMCTS stores expanded states in its node "
               "arrays (revisits descend, never re-simulate).  A Java-"
               "style state-hash table could only merge combo pairs "
               "whose simulations CONVERGE to an identical state:\n")
    _emit(out, "| probe state (tick) | leaf simulations | distinct end "
               "states |")
    _emit(out, "|---|---|---|")
    for t, tot, uniq in rows:
        _emit(out, f"| {t} | {tot} | {uniq} |")
    _emit(out, "\nCollisions are the gap between the last two columns — "
               "a TT would save that fraction of leaf playouts.")


def section_y(out, games=8, generations=16, population=8, seed=7):
    """Synthesis must PRODUCE a winner (VERDICT r4 item 7, the reason
    ai/synthesis/runners/ exists): grammar-search against LightRush from
    a RANDOM seed program, then validate the best program head-to-head.
    The winning program and the fitness curve are the record."""
    import random as _random

    import jax
    from microrts_tpu.bots.scripted import light_rush
    from microrts_tpu.eval.tournament import play_matches_both
    from microrts_tpu.synth.dsl import compile_program
    from microrts_tpu.synth.search import random_program, synthesize

    env = _env()
    lr = light_rush(env)
    t0 = time.time()
    rng = _random.Random(seed)
    res = synthesize(env, [lr], generations=generations,
                     population=population, games_per_pair=2,
                     max_cycles=1500, seed=seed,
                     seed_program=random_program(rng))
    t_synth = time.time() - t0
    bot = compile_program(env, res.program)
    t0 = time.time()
    w0, w1 = play_matches_both(env, bot, lr, n_games=games,
                               max_cycles=3000, seed=53, chunk=32)
    w, t, l = _wtl(w0, w1)
    _emit(out, f"\n## Y. Synthesis produces a winner (grammar search vs "
               f"LightRush from a RANDOM seed; {generations} generations "
               f"x {population} population, 2 games/pair fitness; "
               f"synth {t_synth:.0f}s + validation "
               f"{time.time() - t0:.0f}s)\n")
    _emit(out, "fitness curve (generation, best-so-far): "
               + ", ".join(f"({g}, {f:.2f})" for g, f in res.history))
    _emit(out, f"\nhead-to-head validation vs LightRush "
               f"({2 * games} games, max 3000 cycles): synthesized "
               f"program wins {w}, losses {l}, draws {t}.")
    _emit(out, "\nwinning program:\n```python")
    for cmd in res.program:
        _emit(out, f"  {cmd!r}")
    _emit(out, "```")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--section", nargs="+", default=list("ABEWS"))
    ap.add_argument("--bots", nargs="+", default=None,
                    help="restrict section B to these bots")
    ap.add_argument("--games", type=int, default=8)
    ap.add_argument("--neval", type=int, default=1,
                    help="parallel leaf evaluations in section A")
    ap.add_argument("--pairs", nargs="+", default=None,
                    help="restrict section A to Left:Right pairings")
    ap.add_argument("--no-header", action="store_true",
                    help="section A: emit only rows (resume a table)")
    ap.add_argument("--chunk", type=int, default=None,
                    help="decision frames per device dispatch")
    ap.add_argument("--budget-ms", type=float, default=100.0)
    ap.add_argument("--append", action="store_true")
    ap.add_argument("-o", "--out", default="RESULTS.md")
    args = ap.parse_args()
    if args.cpu:
        from microrts_tpu.utils.platform import force_cpu
        force_cpu()
    import jax
    if not args.append:
        with open(args.out, "w") as f:
            f.write(HEADER)
        _emit(args.out, f"\nDevice: {jax.devices()[0].device_kind}.")
    for s in args.section:
        t0 = time.time()
        try:
            if s.upper() == "B":
                section_b(args.out, only=args.bots, games=args.games,
                          chunk_override=args.chunk)
            elif s.upper() == "A":
                section_a(args.out, games=args.games, chunk=args.chunk,
                          neval=args.neval, pairs=args.pairs,
                          no_header=args.no_header)
            elif s.upper() == "E":
                section_e(args.out, games=args.games)
            elif s.upper() == "W":
                section_w(args.out, games=args.games,
                          budget_ms=args.budget_ms)
            elif s.upper() == "S":
                section_s(args.out, games=args.games)
            elif s.upper() == "P":
                section_p(args.out)
            elif s.upper() == "Y":
                section_y(args.out, games=args.games)
            else:
                raise ValueError(f"unknown section {s}")
        except Exception as e:
            _emit(args.out, f"\n(section {s} failed: "
                            f"{type(e).__name__}: {str(e)[:200]})")
            traceback.print_exc()
        print(f"[section {s} done in {time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
