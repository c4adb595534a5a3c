"""Fall-rate probe under task-layer command switching.

Task policies change (vx, vy, yaw) commands EVERY control step (50 Hz),
unlike the 5 s resample regime the body policy was originally trained in.
This probe rolls the deployed go1plane stack under per-step uniform random
commands drawn from the RL action envelope (wrapper ACTION_SCALE x the 0.5
prescale: vx +-1.0, vy +-0.25, wz +-0.25) and reports terminations per
env-minute — the direct robustness metric behind task-training episode
length (mean ep len 163/500 steps in round-4 go1gate training = falls).

Usage: python tools/probe_robustness.py [--policy path.npz] [--cpu]
       [--envs 64] [--seconds 20] [--switch-every 1]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--policy", default=None,
                   help="body-policy npz (default: the deployed asset)")
    p.add_argument("--envs", type=int, default=64)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--switch-every", type=int, default=1,
                   help="control steps between random command redraws")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mqe_tpu.envs import make_mqe_env

    wrap, _ = make_mqe_env("go1plane", num_envs=args.envs, seed=args.seed)
    env = wrap.env
    if args.policy:
        from mqe_tpu.control.nets import load_body_policy

        env.body_policy_params = load_body_policy(args.policy)

    E = args.envs
    n = int(round(args.seconds / env.dt))
    state, _ = env.reset(jax.random.PRNGKey(args.seed))

    def sample_cmd(k):
        lo = jnp.asarray([-1.0, -0.25, -0.25])
        hi = jnp.asarray([1.0, 0.25, 0.25])
        return jax.random.uniform(k, (E, 1, 3), minval=lo, maxval=hi)

    @jax.jit
    def roll(state, key):
        def body(carry, i):
            state, key, cmd = carry
            key, k1, k2 = jax.random.split(key, 3)
            cmd = jnp.where(i % args.switch_every == 0, sample_cmd(k1), cmd)
            state, _, done, info = env._step_impl(state, cmd, k2)
            fell = done & ~info["time_outs"]
            return (state, key, cmd), fell

        key, k0 = jax.random.split(key)
        (state, _, _), fell = jax.lax.scan(
            body, (state, key, sample_cmd(k0)), jnp.arange(n)
        )
        return fell

    fell = np.asarray(roll(state, jax.random.PRNGKey(args.seed + 1)))
    falls = int(fell.sum())
    env_minutes = E * args.seconds / 60.0
    print(json.dumps({
        "policy": args.policy or "deployed",
        "envs": E,
        "seconds": args.seconds,
        "switch_every_steps": args.switch_every,
        "falls": falls,
        "falls_per_env_minute": round(falls / env_minutes, 4),
    }))


if __name__ == "__main__":
    main()
