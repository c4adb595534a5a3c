"""One-compile trot-gain sweep: all (freq, kp, ksweep) combos ride the env axis.

probe_speed.py retraces per combo (minutes each on CPU); this tool exploits
the per-env gait-parameter support in Go1Env._locomotion_action: every combo
x command pair becomes one env of a single LocomotionEnv batch, so the whole
sweep is ONE jit compile + ONE rollout. Used to retune the model-based trot
base against the reference's ~1:1 command-tracking contract
(ref mqe/envs/go1/go1.py:389-409).

Usage: python tools/sweep_trot.py [--cpu] [--seconds 4]
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--freqs", type=float, nargs="*", default=[3.0, 3.5, 4.0])
    p.add_argument("--kps", type=float, nargs="*", default=[15.0, 25.0])
    p.add_argument("--ksweeps", type=float, nargs="*", default=[1.5, 3.0])
    p.add_argument("--cmds", type=float, nargs="*", default=[0.5, 1.0, 1.5])
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--kints", type=float, nargs="*", default=[None],
                   help="K_INT values to sweep (default: class value)")
    p.add_argument("--leads", type=float, nargs="*", default=[None],
                   help="PHASE_LEAD values to sweep (gait cycles)")
    p.add_argument("--kd", type=float, default=None,
                   help="TAU_KD override (scalar, all combos)")
    p.add_argument("--adaptive", type=float, nargs=2, default=None,
                   metavar=("BASE", "GAIN"),
                   help="adaptive gait freq = BASE + GAIN*|vx_cmd| "
                        "(replaces --freqs)")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mqe_tpu.learn.locomotion_env import LocomotionEnv, LocomotionTrainCfg
    from mqe_tpu.ops import quat as quat_ops

    # deployment-matched conditions: tune the controller without the training
    # curriculum's lag/friction DR (go1plane deploys without them)
    class SweepCfg(LocomotionTrainCfg):
        class domain_rand(LocomotionTrainCfg.domain_rand):
            randomize_friction = False
            randomize_lag_timesteps = False
            init_base_pos_range = dict(x=[0.0, 0.0], y=[0.0, 0.0])
            init_base_vel_range = [0.0, 0.0]
            init_dof_pos_ratio_range = [1.0, 1.0]

    freqs = args.freqs if args.adaptive is None else [args.adaptive[0]]
    kints = args.kints
    combos = list(itertools.product(freqs, args.kps, args.ksweeps, kints,
                                    args.leads))
    rows = [
        (f, kp, ks, ki, ld, c)
        for (f, kp, ks, ki, ld) in combos for c in args.cmds
        for _ in range(args.reps)
    ]
    E = len(rows)
    envw = LocomotionEnv(num_envs=E, seed=0, cfg=SweepCfg)
    env = envw.env
    freq_rows = [
        r[0] + (args.adaptive[1] * abs(r[5]) if args.adaptive else 0.0)
        for r in rows
    ]
    freq = jnp.asarray(freq_rows)[:, None]                   # (E, 1)
    kp = jnp.asarray([r[1] for r in rows])[:, None, None]    # (E, 1, 1)
    ks = jnp.asarray([r[2] for r in rows])[:, None]          # (E, 1)
    env.gait_params_static["freq"] = freq
    env.trot.TAU_KP = kp
    env.trot.K_SWEEP = ks
    if kints != [None]:
        env.trot.K_INT = jnp.asarray([r[3] or 0.0 for r in rows])[:, None]
    if args.leads != [None]:
        env.trot.PHASE_LEAD = jnp.asarray(
            [r[4] or 0.0 for r in rows])[:, None, None]
    if args.kd is not None:
        env.trot.TAU_KD = args.kd
    envw._step_jit = jax.jit(envw._step_impl)
    envw._reset_jit = jax.jit(envw._reset_impl)

    ts, _ = envw.reset(jax.random.PRNGKey(0))
    cmds = jnp.asarray([[r[5], 0.0, 0.0] for r in rows])
    ts = ts.replace(commands=cmds)
    n = int(round(args.seconds / envw.dt))
    settle = n // 4

    @jax.jit
    def roll(ts, key):
        def body(carry, _):
            ts, key = carry
            key, k = jax.random.split(key)
            ts, _, _, _, _ = envw._step_impl(ts, jnp.zeros((E, 1, 12)), k)
            ts = ts.replace(commands=cmds)
            ag = ts.env.phys.agents
            yawq = quat_ops.yaw_quat(ag.quat[:, 0])
            v = quat_ops.quat_rotate_inverse(yawq, ag.lin_vel[:, 0])
            return (ts, key), v[:, 0]

        (ts, _), vx = jax.lax.scan(body, (ts, key), None, length=n)
        return vx

    vx = np.asarray(roll(ts, jax.random.PRNGKey(1)))
    means = vx[settle:].mean(0)  # (E,)
    # average replicas per (combo, cmd)
    for (f, kpv, ksv, ki, ld) in combos:
        res = []
        for c in args.cmds:
            vals = [means[i] for i, r in enumerate(rows)
                    if r == (f, kpv, ksv, ki, ld, c)]
            res.append({"cmd": c, "vx": round(float(np.mean(vals)), 3),
                        "sd": round(float(np.std(vals)), 3)})
        print(json.dumps({"freq": f, "kp": kpv, "ksweep": ksv, "kint": ki,
                          "lead": ld, "adaptive": args.adaptive,
                          "results": res}),
              flush=True)


if __name__ == "__main__":
    main()
