"""Probe: locomotion stability/tracking per GAIT.

The deployed residual body policy is trained under the default-command gait
(trotting, LocomotionTrainCfg -> Go1Cfg). Task configs override the gait
(seesaw/pushbox: pacing — ref go1_seesaw_config.py:91); if the stack is
unstable under a non-training gait, every task that selects it inherits the
falls. Measures falls + v@(0.5,0,0) per gait on go1plane.

Usage: python tools/probe_gait.py [--cpu] [--seconds 5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_gait(gait: str, seconds: float, seed: int, vx: float, policy=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mqe_tpu.envs import make_mqe_env
    from mqe_tpu.ops import quat as quat_ops

    E = 16

    def custom_cfg(cfg):
        class Cfg(cfg):
            class control(cfg.control):
                class default_command(cfg.control.default_command):
                    pass
        Cfg.control.default_command.gait = gait
        return Cfg

    wrap, _ = make_mqe_env("go1plane", num_envs=E, seed=seed,
                           custom_cfg=custom_cfg)
    env = wrap.env
    if policy is not None:
        from mqe_tpu.control.nets import load_body_policy

        env.body_policy_params = load_body_policy(policy)
    cmds = jnp.zeros((E, 1, 3)).at[..., 0].set(vx)
    state, _ = env.reset(jax.random.PRNGKey(seed))
    n = int(round(seconds / env.dt))

    @jax.jit
    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            state, _, done, info = env._step_impl(state, cmds, k)
            ag = state.phys.agents
            yawq = quat_ops.yaw_quat(ag.quat[:, 0])
            v = quat_ops.quat_rotate_inverse(yawq, ag.lin_vel[:, 0])
            fell = done & ~info["time_outs"]
            return (state, key), (v[:, 0], fell)

        return jax.lax.scan(body, (state, key), None, length=n)[1]

    vx_t, fell = rollout(state, jax.random.PRNGKey(seed + 1))
    import numpy as np
    settle = int(round(1.0 / env.dt))
    return {
        "gait": gait,
        "v_at_cmd": round(float(np.asarray(vx_t)[settle:].mean()), 4),
        "n_fell": int(np.asarray(fell).any(0).sum()),
        "n_envs": E,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--vx", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gaits", nargs="*",
                   default=["trotting", "pacing", "bounding", "pronking"])
    p.add_argument("--policy", default=None,
                   help="override body-policy npz path")
    args = p.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    for g in args.gaits:
        print(json.dumps(run_gait(g, args.seconds, args.seed, args.vx,
                                  policy=args.policy)),
              flush=True)


if __name__ == "__main__":
    main()
