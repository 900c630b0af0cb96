"""Recorded PPO learning evidence (VERDICT r3 next-round item 4).

Trains the gridnet PPO policy (train/ppo.py) and records policy
win-rate vs updates into RESULTS.md:

  phase 1: vs PassiveAI  — must exceed 90% wins (the JNIGridnetVecClient
           training contract sanity bar, JNIGridnetVecClient.java:219-307);
  phase 2: vs WorkerRush — must show learning progress (win-rate or
           return trending up over updates).

Run on the real TPU:  timeout 3000 python scripts/learning_curve.py
On CPU (tiny sanity): python scripts/learning_curve.py --cpu \
    --updates1 4 --updates2 4 --num-envs 8 --rollout-len 32 --eval-games 4
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def curve(env, opponent_name, updates, eval_every, eval_games, num_envs,
          rollout_len, seed, resume_params=None):
    import jax

    from microrts_tpu.config import make_bot
    from microrts_tpu.train.ppo import PPOConfig, PPOTrainer
    from microrts_tpu.train.run import evaluate

    opponent = make_bot(opponent_name, env)
    cfg = PPOConfig(num_envs=num_envs, rollout_len=rollout_len)
    trainer = PPOTrainer(env, cfg, opponent=opponent)
    ts = trainer.init(jax.random.PRNGKey(seed))
    if resume_params is not None:
        ts = ts.replace(params=resume_params)
    update = jax.jit(trainer.update)
    rows = []
    t0 = time.time()
    wr0 = evaluate(trainer, ts, opponent, eval_games)
    rows.append((0, wr0, 0.0, 0, 0, time.time() - t0))
    print(f"  update 0: win-rate {wr0:.2f}", flush=True)
    wins = episodes = 0
    for u in range(1, updates + 1):
        ts, m = update(ts)
        wins += int(m["wins"])
        episodes += int(m["episodes"])
        if u % eval_every == 0 or u == updates:
            wr = evaluate(trainer, ts, opponent, eval_games)
            rows.append((u, wr, float(m["mean_reward"]), wins, episodes,
                         time.time() - t0))
            print(f"  update {u}: win-rate {wr:.2f} "
                  f"reward/step {float(m['mean_reward']):+.4f} "
                  f"train-wins {wins}/{episodes} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            wins = episodes = 0
    return rows, ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--map", default="maps/8x8/basesWorkers8x8.xml")
    ap.add_argument("--updates1", type=int, default=30)
    ap.add_argument("--updates2", type=int, default=150)
    ap.add_argument("--eval-every1", type=int, default=5)
    ap.add_argument("--eval-every2", type=int, default=15)
    ap.add_argument("--eval-games", type=int, default=16)
    ap.add_argument("--num-envs", type=int, default=64)
    ap.add_argument("--rollout-len", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--out", default="RESULTS.md")
    args = ap.parse_args()
    if args.cpu:
        from microrts_tpu.utils.platform import force_cpu
        force_cpu()
    import jax

    from microrts_tpu.env.gridnet import GridnetEnv
    from microrts_tpu.utils.assets import asset_path

    env = GridnetEnv(asset_path(args.map))
    dev = jax.devices()[0].device_kind

    def emit(text):
        print(text, flush=True)
        with open(args.out, "a") as f:
            f.write(text + "\n")

    t_all = time.time()
    print("phase 1: vs PassiveAI", flush=True)
    rows1, ts1 = curve(env, "PassiveAI", args.updates1, args.eval_every1,
                       args.eval_games, args.num_envs, args.rollout_len,
                       args.seed)
    # phase 2 CONTINUES the phase-1 policy (curriculum): fresh-init
    # policies die to the rush before any win signal exists
    print("phase 2: vs WorkerRush (resumed from phase 1)", flush=True)
    rows2, _ = curve(env, "WorkerRush", args.updates2, args.eval_every2,
                     args.eval_games, args.num_envs, args.rollout_len,
                     args.seed, resume_params=ts1.params)

    spu = args.num_envs * args.rollout_len
    emit(f"\n## L. PPO learning curves ({args.map}, {args.num_envs} envs x "
         f"{args.rollout_len}-step rollouts = {spu} env-steps/update, "
         f"sampled-policy eval of {args.eval_games} games/point, device "
         f"{dev}, {time.time() - t_all:.0f}s total)\n")
    emit("| phase | update | win-rate | reward/step | train wins/episodes "
         "| wall s |")
    emit("|---|---|---|---|---|---|")
    for u, wr, r, tw, te, w in rows1:
        emit(f"| vs PassiveAI | {u} | {wr:.2f} | {r:+.4f} | {tw}/{te} | "
             f"{w:.0f} |")
    for u, wr, r, tw, te, w in rows2:
        emit(f"| vs WorkerRush | {u} | {wr:.2f} | {r:+.4f} | {tw}/{te} | "
             f"{w:.0f} |")
    final1 = rows1[-1][1]
    final2 = max(r[1] for r in rows2)
    emit(f"\nfinal: {final1:.0%} vs PassiveAI "
         f"(bar: >90%); best {final2:.0%} vs WorkerRush "
         f"(start: {rows2[0][1]:.0%}).")


if __name__ == "__main__":
    main()
