"""Round-2 evidence artifacts: the tournament results VERDICT r1 demands.

Produces ``RESULTS.md`` at the repo root with four recorded tournaments:

  A. NaiveMCTS vs MonteCarlo vs NaiveSampling head-to-head at equal playout
     budget on basesWorkers8x8 and 16x16 (VERDICT r1 next-round #1).
  B. Search bots (ABCD/IDABCD/RTMinimax/IDRTMinimax/PortfolioAI/PGSAI/
     UCT tree/LSI/NaiveMCTS/Puppet) vs RandomBiasedAI on 8x8 (#2: >=90%).
  C. Scripted variant family round-robin vs the four rushes (#3).
  D. PO tournament: believe-state search vs po-wrapped flat MC (#8).

Run: ``python scripts/evidence_r02.py [--cpu] [--section A B C D]``.
Each section appends its table as soon as it finishes, so a partial run
still leaves a usable artifact.  Reference analog: tests/CompareAllAIs*.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HEADER = """# Recorded tournament evidence (round 2)

Reproduce with `python scripts/evidence_r02.py --cpu`.  Winners computed by
`eval.tournament` (whole tournament = one compiled batched program); w/t/g =
wins/ties/games per ordered pairing; draws include max-cycle cutoffs.
"""


def _emit(out, text):
    print(text, flush=True)
    with open(out, "a") as f:
        f.write(text + "\n")


def section_a(out):
    import jax

    from microrts_tpu.bots.search import monte_carlo_bot, naive_sampling_bot
    from microrts_tpu.bots.treesearch import naive_mcts_bot
    from microrts_tpu.env.gridnet import GridnetEnv
    from microrts_tpu.eval.tournament import round_robin
    from microrts_tpu.utils.assets import asset_path

    _emit(out, "\n## A. NaiveMCTS vs playout searchers "
               "(equal budget: 24 playouts x 32 ticks per move)\n")
    import jax as _jax
    on_tpu = _jax.devices()[0].platform != "cpu"
    confs = [("basesWorkers8x8", "maps/8x8/basesWorkers8x8.xml", 4, 600)]
    if on_tpu:   # the 16x16 search tournament is TPU-budget territory
        confs.append(("basesWorkers16x16",
                      "maps/16x16/basesWorkers16x16.xml", 6, 800))
    for label, mp, games, cyc in confs:
        env = GridnetEnv(asset_path(mp))
        bots = {
            "NaiveMCTS": naive_mcts_bot(env, max_nodes=48, max_children=8,
                                        max_depth=6, n_playouts=24,
                                        playout_len=32),
            "MonteCarlo": monte_carlo_bot(env, n_candidates=24,
                                          playout_len=32),
            "NaiveSampling": naive_sampling_bot(env, n_rounds=24,
                                                playout_len=32),
        }
        t0 = time.time()
        res = round_robin(env, bots, games_per_pair=games, max_cycles=cyc,
                          seed=11)
        _emit(out, f"### {label} ({games} games/ordered pair, "
                   f"max {cyc} cycles, {time.time()-t0:.0f}s)\n")
        _emit(out, "```\n" + res.table() + "\n```")


def section_b(out):
    import jax

    from microrts_tpu.bots import minimax as MM
    from microrts_tpu.bots import portfolio as PF
    from microrts_tpu.bots import treesearch as TS
    from microrts_tpu.bots.lsi import lsi_bot
    from microrts_tpu.bots.puppet import puppet_ab_bot
    from microrts_tpu.config import make_bot
    from microrts_tpu.env.gridnet import GridnetEnv
    from microrts_tpu.eval.tournament import play_matches
    from microrts_tpu.utils.assets import asset_path

    env = GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))
    on_tpu = jax.devices()[0].platform != "cpu"
    # CPU runs use the test-proven reduced budgets (the registry defaults
    # are TPU-scale); each row states its budget
    bots = {
        "ABCD": (lambda: MM.abcd_bot(env, max_depth=2, playout_len=24,
                                     node_budget=160),
                 "depth 2, playout 24, nodes 160"),
        "RTMinimax": (lambda: MM.rt_minimax_bot(env, lookahead=25,
                                                node_budget=160),
                      "lookahead 25, nodes 160"),
        "PortfolioAI": (lambda: PF.portfolio_ai_bot(env, lookahead=50),
                        "4 scripts, lookahead 50"),
        "PGSAI": (lambda: PF.pgs_bot(env, lookahead=30, slots=8,
                                     responses=1),
                  "lookahead 30, 8 slots, 1 response round"),
        "UCT": (lambda: TS.uct_tree_bot(env, n_playouts=24, max_nodes=48,
                                        n_candidates=6, playout_len=32),
                "24 playouts x 32"),
        "LSI": (lambda: lsi_bot(env, n_probes=16, n_candidates=8,
                                playout_len=24),
                "16 probes, 8 candidates"),
        "NaiveMCTS": (lambda: TS.naive_mcts_bot(
            env, n_playouts=24, max_nodes=48, max_children=8,
            playout_len=32), "24 playouts x 32"),
        "PuppetNoPlan": (lambda: puppet_ab_bot(env), "default"),
        "SCV": (lambda: make_bot("SCV", env), "default"),
    }
    if on_tpu:
        bots = {n: (lambda n=n: make_bot(n, env), "registry default")
                for n in ("ABCD", "IDABCD", "RTMinimax", "IDRTMinimax",
                          "PortfolioAI", "PGSAI", "UCT", "LSI",
                          "NaiveMCTS", "PuppetNoPlan", "PuppetSearchMCTS",
                          "SCV", "AHTN")}
    _emit(out, "\n## B. Search bots vs RandomBiasedAI (basesWorkers8x8, "
               "10 games each side, max 600 cycles)\n")
    _emit(out, "| bot | budget | wins | ties | losses | win% |")
    _emit(out, "|---|---|---|---|---|---|")
    rb = make_bot("RandomBiasedAI", env)
    for name, (mk, budget) in bots.items():
        t0 = time.time()
        bot = mk()
        w0 = play_matches(env, bot, rb, n_games=10, max_cycles=600, seed=5)
        w1 = play_matches(env, rb, bot, n_games=10, max_cycles=600, seed=6)
        wins = int((w0 == 0).sum() + (w1 == 1).sum())
        loss = int((w0 == 1).sum() + (w1 == 0).sum())
        ties = 20 - wins - loss
        _emit(out, f"| {name} | {budget} | {wins} | {ties} | {loss} | "
                   f"{100.0 * wins / 20:.0f}% |")
        print(f"  [{name}: {time.time()-t0:.0f}s]", flush=True)


def section_c(out):
    from microrts_tpu.eval.experimenter import run_experiments

    pool = ["WorkerRush", "LightRush", "HeavyRush", "RangedRush",
            "WorkerRushPlusPlus", "WorkerDefense", "LightDefense",
            "HeavyDefense", "RangedDefense", "EconomyRush",
            "EconomyMilitaryRush", "EMRDeterministico",
            "EconomyRushBurster", "SimpleEconomyRush",
            "CRush_V1", "CRush_V2"]
    t0 = time.time()
    rep = run_experiments(["maps/8x8/basesWorkers8x8.xml"], pool,
                          iterations=2, max_cycles=2000, max_inactive=300,
                          seed=3)
    _emit(out, f"\n## C. Scripted variant family round-robin "
               f"(2 iterations/ordered pair, {time.time()-t0:.0f}s)\n")
    _emit(out, "```\n" + rep.table() + "\n```")


def section_d(out):
    from microrts_tpu.bots.believestate import (believe_state_bot,
                                                play_matches_stateful,
                                                stateless)
    from microrts_tpu.bots.scripted import po_wrap
    from microrts_tpu.bots.search import monte_carlo_bot
    from microrts_tpu.env.gridnet import GridnetEnv
    from microrts_tpu.utils.assets import asset_path

    env = GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))
    inner = monte_carlo_bot(env, n_candidates=8, playout_len=24)
    bs = believe_state_bot(env, inner, level=3)
    po_mc = stateless(po_wrap(env, monte_carlo_bot(env, n_candidates=8,
                                                   playout_len=24)))
    n = 12
    w = play_matches_stateful(env, bs, po_mc, n_games=n, max_cycles=2000,
                              seed=7)
    wins, loss = int((w == 0).sum()), int((w == 1).sum())
    _emit(out, "\n## D. PO search: BS3(MonteCarlo) vs po-wrapped "
               f"MonteCarlo (basesWorkers8x8, fog on, {n} games, "
               "max 2000 cycles)\n")
    _emit(out, f"BS3 wins {wins}, losses {loss}, "
               f"draws {n - wins - loss}.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--section", nargs="+", default=list("CDBA"))
    ap.add_argument("--append", action="store_true",
                    help="append to the artifact instead of restarting it")
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
        getattr(sys.modules[__name__], f"section_{s.lower()}")(args.out)
        print(f"[section {s} done in {time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
