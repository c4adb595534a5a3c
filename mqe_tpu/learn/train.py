"""Training CLI (ref openrl_ws/train.py):

  python -m mqe_tpu.learn.train --task go1gate --algo ppo --num-envs 512 \
      --train-timesteps 40000000 --checkpoint-dir ./checkpoints

Algorithms: ppo, jrpo, dppo, mat (OpenRL menu, ref train.py:25-51).
Checkpoints are orbax pytrees.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="go1gate")
    p.add_argument("--algo", default="ppo", choices=["ppo", "jrpo", "dppo", "mat", "sppo"])
    p.add_argument("--num-envs", type=int, default=None)
    p.add_argument("--train-timesteps", type=int, default=1_000_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=7e-4)
    p.add_argument("--rollout-len", type=int, default=32)
    p.add_argument("--checkpoint-dir", default="./checkpoints")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--log-file", default=None)
    p.add_argument("--resume", default=None, help="checkpoint path to resume params from")
    p.add_argument("--profile-dir", default=None, help="capture a jax profiler trace here")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mqe_tpu.envs import make_mqe_env
    from mqe_tpu.learn.ppo import PPOConfig, PPOTrainer

    wrap, cfg = make_mqe_env(args.task, num_envs=args.num_envs, seed=args.seed)
    algo = "ppo" if args.algo == "sppo" else args.algo  # sppo: OpenRL's simple-PPO == shared-param PPO here
    pcfg = PPOConfig(algo=algo, lr=args.lr, rollout_len=args.rollout_len)
    if args.algo == "mat":
        from mqe_tpu.learn.mat import MATTrainer

        trainer = MATTrainer(wrap, pcfg, seed=args.seed)
    else:
        trainer = PPOTrainer(wrap, pcfg, seed=args.seed)
    print(
        f"task={args.task} algo={args.algo} envs={trainer.E} agents={trainer.A} "
        f"obs_dim={trainer.obs_dim}",
        flush=True,
    )

    logf = open(args.log_file, "a") if args.log_file else None

    def cb(m):
        line = json.dumps({"task": args.task, "algo": args.algo, **m})
        print(line, flush=True)
        if logf:
            logf.write(line + "\n")
            logf.flush()

    if args.resume:
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.resume))
        trainer.init_params = restored["params"]
        print(f"resumed params from {args.resume}", flush=True)

    t0 = time.time()
    if args.profile_dir:
        from mqe_tpu.utils.metrics import profile_trace

        with profile_trace(args.profile_dir):
            ts, history = trainer.train(args.train_timesteps, callback=cb)
    else:
        ts, history = trainer.train(args.train_timesteps, callback=cb)
    wall = time.time() - t0
    print(f"trained {args.train_timesteps} env steps in {wall:.0f}s "
          f"({args.train_timesteps / wall:.0f} steps/s)", flush=True)

    os.makedirs(args.checkpoint_dir, exist_ok=True)
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(args.checkpoint_dir, f"{args.task}_{args.algo}"))
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, {"params": ts.params}, force=True)
    print(f"saved checkpoint to {path}", flush=True)


if __name__ == "__main__":
    main()
