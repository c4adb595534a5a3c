"""Win-rate evaluation for go1wrestling self-play policies.

Rolls out a trained shared policy in the wrestling arena and attributes
episode outcomes from PRE-reset fall flags (the env auto-resets on the
fall step, so post-reset obs never shows a fallen robot; the wrapper's
self-play reward already encodes per-seat falls — see
mqe_tpu/envs/wrappers.py Go1WrestlingWrapper._selfplay_reward):

  win   — the seat-1 opponent crossed the env termination thresholds
          (roll 0.8 / pitch 1.6 rad / z < 0.3 m) while seat 0 stayed up
  loss  — the mirror outcome
  mutual— both fell on the same control step
  draw  — episode timed out with both upright

Opponent modes:
  --opponent self  — the same policy drives both seats (the wrapper mirrors
                     seat 1's lateral action/obs); win/loss should be
                     ~symmetric, the interesting number is the decisiveness
                     (1 - draw rate)
  --opponent zero  — seat 1 outputs zero commands (stands in place);
                     measures whether the policy topples a passive opponent

Prints one JSON line. Reference has no wrestling metric at all (its reward
channel reads post-reset obs and never fires; go1_wrestling_wrapper.py:62-81).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--episodes", type=int, default=8,
                   help="finished episodes per env before stopping")
    p.add_argument("--opponent", default="self", choices=["self", "zero"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--stochastic", action="store_true")
    p.add_argument("--json", default=None, help="append the record here too")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mqe_tpu.envs import make_mqe_env
    from mqe_tpu.learn.networks import ActorCritic
    from mqe_tpu.learn.ppo import PPOConfig, PPOTrainer
    from mqe_tpu.utils.checkpoint import restore_pytree

    wrap, _ = make_mqe_env("go1wrestling", num_envs=args.num_envs, seed=args.seed)
    wrap.selfplay = True  # per-seat fall reward is the outcome oracle
    net = ActorCritic(action_dim=wrap.action_dim)
    tr = PPOTrainer(wrap, PPOConfig(), seed=args.seed)
    params = restore_pytree(args.checkpoint, tr.init_state()).params

    key = jax.random.PRNGKey(args.seed)
    ts, obs = wrap.reset(key)

    @jax.jit
    def act(params, obs, k):
        mean, log_std, _ = net.apply(params, obs)
        if args.stochastic:
            mean = mean + jnp.exp(log_std) * jax.random.normal(k, mean.shape)
        a = wrap.rl_prescale(mean)
        if args.opponent == "zero":
            a = a.at[:, 1].set(0.0)
        return a

    E = args.num_envs
    counts = {"win": 0, "loss": 0, "mutual": 0, "draw": 0}
    finished = 0
    max_steps = args.episodes * wrap.env.max_episode_length
    for _ in range(max_steps):
        key, k, k_act = jax.random.split(key, 3)
        actions = act(params, obs, k_act)
        ts, obs, rew, done, info = wrap.step(ts, actions, k)
        d = np.asarray(done)
        if d.any():
            r = np.asarray(rew)
            # selfplay reward: rew[:, i] = S*fallen[opp] - P*fallen[i]
            # (S=10, P=1) -> fallen_i iff the OTHER seat's channel > 5
            fallen1 = r[:, 0] > 5.0
            fallen0 = r[:, 1] > 5.0
            counts["win"] += int((d & fallen1 & ~fallen0).sum())
            counts["loss"] += int((d & fallen0 & ~fallen1).sum())
            counts["mutual"] += int((d & fallen0 & fallen1).sum())
            counts["draw"] += int((d & ~fallen0 & ~fallen1).sum())
            finished += int(d.sum())
        if finished >= args.episodes * E:
            break

    n = max(finished, 1)
    rec = {
        "task": "go1wrestling",
        "checkpoint": args.checkpoint,
        "opponent": args.opponent,
        "episodes": finished,
        "win_rate": round(counts["win"] / n, 4),
        "loss_rate": round(counts["loss"] / n, 4),
        "mutual_rate": round(counts["mutual"] / n, 4),
        "draw_rate": round(counts["draw"] / n, 4),
        "mode": "stochastic" if args.stochastic else "deterministic",
        "seed": args.seed,
    }
    print(json.dumps(rec))
    if args.json:
        with open(args.json, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
