"""Train the low-level locomotion (body) policy with PPO.

Produces a replacement for the reference's missing walk-these-ways body blob
(ref .MISSING_LARGE_BLOBS:2-3): a 70-dim-obs -> 12-action MLP usable as the
`policy` locomotion backend of Go1Env.

  python -m mqe_tpu.learn.train_locomotion --num-envs 1024 \
      --train-timesteps 20000000 --out mqe_tpu/assets/body_policy.npz
"""
from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--train-timesteps", type=int, default=10_000_000)
    p.add_argument("--rollout-len", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="mqe_tpu/assets/body_policy.npz")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--updates-per-call", type=int, default=1)
    p.add_argument("--split-jit", action="store_true")
    p.add_argument(
        "--resample-prob", type=float, default=0.0,
        help="per-env per-step probability of a random command switch "
             "(robustness to the task layer's 50 Hz command changes)")
    p.add_argument(
        "--multi-gait", type=float, default=0.0,
        help="per-episode probability of a non-trot library gait "
             "(pacing/bounding/pronking uniform); conditions the policy on "
             "the gait-params obs dims like the WTW reference")
    p.add_argument(
        "--init-policy", default=None,
        help="warm-start actor+critic from a previously saved body-policy "
             "npz (continue training instead of from scratch)")
    p.add_argument(
        "--backend", default="residual", choices=["residual", "policy", "trot"],
        help="'residual' = learn a correction on the model-based trot "
        "(well-conditioned); 'policy' = learn joint offsets from scratch "
        "against the bare actuator-net path (ref go1.py:315-354)",
    )
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mqe_tpu.learn.locomotion_env import LocomotionEnv, LocomotionTrainCfg
    from mqe_tpu.learn.ppo import PPOConfig, PPOTrainer

    # train against the SAME torque path the deployed policy will use: the
    # trot backend adds a supplementary PD in Go1Env._torques, the policy
    # backend is the bare actuator net (reference parity)
    LocomotionTrainCfg.control.locomotion_backend = args.backend
    env = LocomotionEnv(num_envs=args.num_envs, seed=args.seed,
                        resample_prob=args.resample_prob,
                        multi_gait=args.multi_gait)
    trainer = PPOTrainer(
        env,
        PPOConfig(lr=args.lr, rollout_len=args.rollout_len, ent_coef=1e-3),
        seed=args.seed,
    )
    print(f"locomotion training: envs={args.num_envs}", flush=True)

    if args.init_policy:
        d = np.load(args.init_policy)
        paths, treedef = jax.tree_util.tree_flatten_with_path(trainer.init_params)
        leaves = []
        missing = []
        for path, leaf in paths:
            name = "/".join(str(k.key) for k in path)
            if name in d:
                assert d[name].shape == leaf.shape, (name, d[name].shape, leaf.shape)
                leaves.append(jax.numpy.asarray(d[name]))
            else:
                missing.append(name)
                leaves.append(leaf)
        trainer.init_params = jax.tree_util.tree_unflatten(treedef, leaves)
        print(f"warm-started from {args.init_policy}"
              + (f" (fresh: {missing})" if missing else ""), flush=True)

    def cb(m):
        print(json.dumps(m), flush=True)

    t0 = time.time()
    ts, history = trainer.train(args.train_timesteps, callback=cb, updates_per_call=args.updates_per_call, log_every=1, split=args.split_jit)
    print(f"done in {time.time() - t0:.0f}s", flush=True)

    # flatten flax params -> npz
    flat = jax.tree_util.tree_flatten_with_path(ts.params)[0]
    out = {"meta_prescale": np.asarray(env.prescale)}
    for path, leaf in flat:
        name = "/".join(str(k.key) for k in path)
        out[name] = np.asarray(leaf)
    np.savez(args.out, **out)
    print(f"saved body policy params to {args.out}", flush=True)


if __name__ == "__main__":
    main()
