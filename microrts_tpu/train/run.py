"""Training CLI: PPO against scripted opponents with eval + checkpoints.

    python -m microrts_tpu.train.run --map maps/8x8/basesWorkers8x8.xml \
        --opponent WorkerRush --updates 50 --num-envs 64 [--cpu] \
        [--ckpt out.npz] [--resume in.npz] [--sharded]

Replaces the MicroRTS-Py training loop's Python<->JVM stepping with the
fully on-device PPO of train/ppo.py; metrics print per update; --sharded
runs the data-parallel shard_map path over all visible devices.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--map", default="maps/8x8/basesWorkers8x8.xml")
    p.add_argument("--opponent", default="WorkerRush")
    p.add_argument("--updates", type=int, default=50)
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--rollout-len", type=int, default=128)
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt", help="save final params here (npz)")
    p.add_argument("--ckpt-every", type=int, default=0)
    p.add_argument("--resume", help="load params from npz")
    p.add_argument("--eval-every", type=int, default=0)
    p.add_argument("--eval-games", type=int, default=8)
    p.add_argument("--sharded", action="store_true")
    p.add_argument("--selfplay", action="store_true",
                   help="mirror self-play: player 1 uses the same policy")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        from ..utils.platform import force_cpu
        force_cpu()

    import jax
    import numpy as np

    from ..config import make_bot
    from ..env.gridnet import GridnetEnv
    from ..utils.assets import asset_path
    from ..utils.checkpoint import load_pytree, save_pytree
    from .ppo import PPOConfig, PPOTrainer

    env = GridnetEnv(asset_path(args.map))
    opponent = make_bot(args.opponent, env)
    cfg = PPOConfig(num_envs=args.num_envs, rollout_len=args.rollout_len,
                    lr=args.lr)
    mesh = None
    if args.sharded:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh()
        print(f"mesh: {mesh.devices.size} devices")
    trainer = PPOTrainer(env, cfg, opponent=opponent, mesh=mesh,
                         selfplay=args.selfplay)
    ts = trainer.init(jax.random.PRNGKey(args.seed))
    if args.resume:
        ts = ts.replace(params=load_pytree(args.resume, ts.params))
        print(f"resumed params from {args.resume}")

    update = jax.jit(trainer.update_sharded if args.sharded
                     else trainer.update)
    steps_per_update = cfg.num_envs * cfg.rollout_len
    t0 = time.time()
    for u in range(1, args.updates + 1):
        ts, m = update(ts)
        if u == 1:
            jax.block_until_ready(m)
            t0 = time.time()  # exclude compile from throughput
        sps = steps_per_update * max(u - 1, 1) / max(time.time() - t0, 1e-9)
        print(f"update {u:4d}  reward/step {float(m['mean_reward']):+.4f}  "
              f"episodes {int(m['episodes'])}  "
              f"wins {int(m['wins'])}  "
              f"entropy {float(m['entropy']):.2f}  "
              f"ratio {float(m['ratio']):.3f}  "
              f"env-steps/s {sps:,.0f}", flush=True)
        if args.ckpt and args.ckpt_every and u % args.ckpt_every == 0:
            save_pytree(args.ckpt, ts.params)
        if args.eval_every and u % args.eval_every == 0:
            wr = evaluate(trainer, ts, opponent, args.eval_games)
            print(f"  eval: win-rate {wr:.2f} vs {args.opponent}",
                  flush=True)
    if args.ckpt:
        save_pytree(args.ckpt, ts.params)
        print(f"params saved to {args.ckpt}")
    return ts


def evaluate(trainer, ts, opponent, n_games: int, max_cycles: int = 2000,
             sample: bool = True):
    """Policy win-rate vs the opponent (Tournament-style batch).

    ``sample=True`` plays the trained object itself — PPO's stochastic
    policy; ``sample=False`` plays the argmax policy (entropy
    regularization can leave the argmax degenerate while the sampled
    policy wins, so greedy eval understates the learner)."""
    from ..models.gridnet_policy import greedy_action, sample_action

    env = trainer.env

    def policy_bot(state, player, key):
        obs = trainer._obs(state)[None]
        logits, _ = trainer.model.apply(ts.params, obs)
        mask = trainer._mask(state)
        if sample:
            return sample_action(key, logits[0], mask, trainer.space)[0]
        return greedy_action(logits[0], mask, trainer.space)

    from ..eval.tournament import play_matches
    w = play_matches(env, policy_bot, opponent, n_games, max_cycles)
    return float((w == 0).mean())


if __name__ == "__main__":
    main()
