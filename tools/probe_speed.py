"""Physical speed-ceiling probe for the locomotion stack.

Drives the joint-level LocomotionEnv (which does NOT clip task commands)
with a fixed forward command, optionally overriding gait frequency and
residual policy, and reports steady-state forward speed. Used to decide
whether the 0.73/1.0 tracking plateau (tools/eval_tracking.py) is a
controller limit (stride-rate bound) or a physics limit.

Usage: python tools/probe_speed.py [--cpu] [--freq 3.0] [--cmds 1.0 1.5 2.0]
       [--policy mqe_tpu/assets/body_policy.npz]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--freq", type=float, default=None)
    p.add_argument("--cmds", type=float, nargs="*", default=[1.0, 1.5, 2.0])
    p.add_argument("--policy", default=None)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--kp", type=float, default=None, help="override trot TAU_KP")
    p.add_argument("--kd", type=float, default=None, help="override trot TAU_KD")
    p.add_argument("--ksweep", type=float, default=None, help="override trot K_SWEEP")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mqe_tpu.learn.locomotion_env import LocomotionEnv
    from mqe_tpu.ops import quat as quat_ops

    E = len(args.cmds)
    envw = LocomotionEnv(num_envs=E, seed=0)
    env = envw.env
    if args.freq is not None:
        env.gait_params_static["freq"] = args.freq
    if args.kp is not None:
        env.trot.TAU_KP = args.kp
    if args.kd is not None:
        env.trot.TAU_KD = args.kd
    if args.ksweep is not None:
        env.trot.K_SWEEP = args.ksweep
    envw._step_jit = jax.jit(envw._step_impl)  # re-trace with new constants
    policy = None
    if args.policy:
        from mqe_tpu.control.nets import load_body_policy

        policy = load_body_policy(args.policy)

    ts, obs = envw.reset(jax.random.PRNGKey(0))
    cmds = jnp.asarray([[c, 0.0, 0.0] for c in args.cmds])
    ts = ts.replace(commands=cmds)
    n = int(round(args.seconds / envw.dt))
    settle = n // 4

    @jax.jit
    def roll(ts, key):
        def body(carry, _):
            ts, key = carry
            key, k = jax.random.split(key)
            obs = ts.extra["obs"]
            act = policy(obs) if policy is not None else jnp.zeros((E, 12))
            ts, _, _, _, _ = envw._step_impl(ts, act[:, None, :], k)
            ts = ts.replace(commands=cmds)  # pin commands (no resample)
            ag = ts.env.phys.agents
            yawq = quat_ops.yaw_quat(ag.quat[:, 0])
            v = quat_ops.quat_rotate_inverse(yawq, ag.lin_vel[:, 0])
            return (ts, key), v[:, 0]

        (ts, _), vx = jax.lax.scan(body, (ts, key), None, length=n)
        return vx

    vx = np.asarray(roll(ts, jax.random.PRNGKey(1)))
    out = {
        "freq": args.freq,
        "kp": args.kp,
        "kd": args.kd,
        "ksweep": args.ksweep,
        "policy": bool(policy),
        "results": [
            {"cmd": c, "vx": round(float(vx[settle:, i].mean()), 3)}
            for i, c in enumerate(args.cmds)
        ],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
