"""Locomotion velocity-tracking evaluation over a (vx, vy, yaw) command grid.

Measures the deployed locomotion stack (Go1Env go1plane, default backend =
trot + trained residual, the same path every task wrapper drives) against the
reference's frozen walk-these-ways policy contract: commands are tracked
~1:1 (ref go1.py:35-108). Each env in a batch gets one grid command held
constant; after a settle window we average the body-yaw-frame velocity and
report per-axis tracking error.

Emits one JSON line:
  {"mean_abs_err_vx", "mean_abs_err_vy", "mean_abs_err_wz",
   "v_at_1ms": <mean forward speed under the (1,0,0) command>, ...}

Usage:
  python tools/eval_tracking.py [--cpu] [--seconds 4.0] [--backend residual]
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def command_grid():
    """25-point grid: pure + mixed commands inside the clip box [-1, 1]."""
    pts = []
    for vx in (-1.0, -0.5, 0.5, 1.0):
        pts.append((vx, 0.0, 0.0))
    for vy in (-0.5, 0.5):
        pts.append((0.0, vy, 0.0))
    for wz in (-1.0, -0.5, 0.5, 1.0):
        pts.append((0.0, 0.0, wz))
    for vx, vy in itertools.product((-0.6, 0.6), (-0.4, 0.4)):
        pts.append((vx, vy, 0.0))
    for vx, wz in itertools.product((0.8, -0.8), (0.5, -0.5)):
        pts.append((vx, 0.0, wz))
    pts.append((1.0, 0.0, 0.5))
    pts.append((0.6, 0.3, -0.5))
    pts.append((0.0, 0.0, 0.0))
    return pts


def evaluate(seconds=4.0, settle=1.0, backend=None, seed=0, policy=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mqe_tpu.envs import make_mqe_env
    from mqe_tpu.ops import quat as quat_ops

    grid = command_grid()
    E = len(grid)

    def custom_cfg(cfg):
        # backend must be set BEFORE construction: __init__ derives
        # hist_len / adaptation module / loco_hist sizing from it
        if backend is not None:
            class Cfg(cfg):
                class control(cfg.control):
                    locomotion_backend = backend
            return Cfg
        return cfg

    wrap, _ = make_mqe_env("go1plane", num_envs=E, seed=seed,
                           custom_cfg=custom_cfg)
    env = wrap.env
    if policy is not None:
        from mqe_tpu.control.nets import load_body_policy

        env.body_policy_params = load_body_policy(policy)
    cmds = jnp.asarray(grid)[:, None, :]  # (E, 1, 3)

    state, _ = env.reset(jax.random.PRNGKey(seed))
    n_steps = int(round(seconds / env.dt))
    n_settle = int(round(settle / env.dt))

    @jax.jit
    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            state, _, done, info = env._step_impl(state, cmds, k)
            ag = state.phys.agents
            yawq = quat_ops.yaw_quat(ag.quat[:, 0])
            v = quat_ops.quat_rotate_inverse(yawq, ag.lin_vel[:, 0])
            wz = ag.ang_vel[:, 0, 2]
            fell = done & ~info["time_outs"]  # non-timeout termination
            return (state, key), (v[:, 0], v[:, 1], wz, fell)

        (state, key), traj = jax.lax.scan(body, (state, key), None, length=n_steps)
        return state, traj

    _, (vx, vy, wz, fell) = rollout(state, jax.random.PRNGKey(seed + 1))
    vx, vy, wz = (np.asarray(a)[n_settle:].mean(0) for a in (vx, vy, wz))
    fell = np.asarray(fell).any(0)
    g = np.asarray(grid)

    err = np.stack([np.abs(vx - g[:, 0]), np.abs(vy - g[:, 1]), np.abs(wz - g[:, 2])], -1)
    i1 = grid.index((1.0, 0.0, 0.0))
    out = {
        "backend": env.backend,
        "n_commands": E,
        "seconds": seconds,
        "mean_abs_err_vx": round(float(err[:, 0].mean()), 4),
        "mean_abs_err_vy": round(float(err[:, 1].mean()), 4),
        "mean_abs_err_wz": round(float(err[:, 2].mean()), 4),
        "max_abs_err_vx": round(float(err[:, 0].max()), 4),
        "v_at_1ms": round(float(vx[i1]), 4),
        "n_fell": int(fell.sum()),
    }
    per_cmd = [
        {"cmd": list(map(float, g[i])),
         "meas": [round(float(vx[i]), 3), round(float(vy[i]), 3), round(float(wz[i]), 3)]}
        for i in range(E)
    ]
    return out, per_cmd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--backend", default=None, choices=[None, "residual", "trot", "policy"])
    p.add_argument("--per-cmd", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--policy", default=None, help="override body-policy npz path")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    out, per_cmd = evaluate(
        seconds=args.seconds, backend=args.backend, seed=args.seed, policy=args.policy
    )
    print(json.dumps(out), flush=True)
    if args.per_cmd:
        for row in per_cmd:
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
