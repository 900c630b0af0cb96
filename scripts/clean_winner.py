"""Clean the shipped synthesized winner (RESULTS.md §Y) with the
PerformCleanerAST analog and re-validate it vs LightRush.

    python scripts/clean_winner.py [--cpu]

Writes the shrunk artifact next to the original
(assets/synth/winner_vs_lightrush_8x8_clean.txt) and prints a
RESULTS-ready summary: nodes before/after, accepted edits, and the
cleaned program's head-to-head record vs LightRush (both seats).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--games", type=int, default=8,
                    help="games per seat for the validation head-to-head")
    ap.add_argument("--max-cycles", type=int, default=3000)
    args = ap.parse_args()
    if args.cpu:
        from microrts_tpu.utils.platform import force_cpu
        force_cpu()

    from microrts_tpu.config import make_bot
    from microrts_tpu.env.gridnet import GridnetEnv
    from microrts_tpu.eval.tournament import play_matches_both
    from microrts_tpu.synth import export
    from microrts_tpu.synth.clean import clean_program
    from microrts_tpu.synth.dsl import compile_program
    from microrts_tpu.utils.assets import asset_path

    env = GridnetEnv(asset_path("maps/8x8/basesWorkers8x8.xml"))
    src = asset_path("synth/winner_vs_lightrush_8x8.txt")
    prog = export.load_program(src)
    light = make_bot("LightRush", env)

    t0 = time.time()
    res = clean_program(env, prog, [light], seed=0)
    t_clean = time.time() - t0
    print(f"clean: {res.nodes_before} -> {res.nodes_after} nodes "
          f"in {t_clean:.0f}s; removed: {res.removed or 'nothing'}")
    for line in export.dumps(res.program).splitlines():
        print("  " + line)

    t0 = time.time()
    bot = compile_program(env, res.program)
    w01, w10 = play_matches_both(env, bot, light, args.games,
                                 max_cycles=args.max_cycles, seed=7)
    wins = int((w01 == 0).sum() + (w10 == 1).sum())
    losses = int((w01 == 1).sum() + (w10 == 0).sum())
    draws = 2 * args.games - wins - losses
    print(f"validation vs LightRush ({2 * args.games} games, "
          f"{time.time() - t0:.0f}s): wins {wins}, losses {losses}, "
          f"draws {draws}")

    out = src.replace(".txt", "_clean.txt")
    export.save_program(res.program, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
