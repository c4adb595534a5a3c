"""Probe: is the seesaw plank physically climbable in our contact model?

Round-5 diagnostic for the go1seesaw plateau (0 success at 750M
transitions, robots stall around x~5 on the x~4..8 ramp): teleport a robot
directly ONTO the plank at a given x, command full forward, and log the
x/z trajectory. Separates "policy never learned to climb" from "feet slip
on the inclined moving plank" (foot-sphere vs NPC-prim contact).

Usage: python tools/probe_seesaw.py [--cpu] [--x0 5.0] [--steps 150]
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
    p.add_argument("--x0", type=float, default=5.0)
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--vx", type=float, default=1.0)
    p.add_argument("--gait", default="trotting")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mqe_tpu.envs import make_mqe_env

    def custom_cfg(cfg):
        class Cfg(cfg):
            class control(cfg.control):
                class default_command(cfg.control.default_command):
                    pass
        Cfg.control.default_command.gait = args.gait
        return Cfg

    wrap, _ = make_mqe_env("go1seesaw", num_envs=2, seed=0,
                           custom_cfg=custom_cfg)
    env = wrap.env
    state, _ = env.reset(jax.random.PRNGKey(0))

    # plank pivot: cfg init_states_npc (x=8, z=1.0), joint -0.2 -> surface
    # height at x is z = 1.0 - (8 - x) * tan(0.2) + half-thickness
    import math
    th = 0.2
    x0 = args.x0
    z_plank = 1.0 - (8.0 - x0) * math.tan(th) + 0.03 + 0.30
    eo = np.asarray(env.env_origins)
    ag = state.phys.agents
    pos = np.asarray(ag.pos).copy()
    # pitch the base to match the ramp? keep flat; PD absorbs 11 deg
    for e in range(2):
        pos[e, 0] = [eo[e, 0] + x0, eo[e, 1] - 0.3, z_plank]
        pos[e, 1] = [eo[e, 0] + x0 - 0.8, eo[e, 1] + 0.3, z_plank - 0.8 * math.tan(th)]
    state = state.replace(
        phys=state.phys.replace(agents=ag.replace(pos=jnp.asarray(pos)))
    )

    cmds = jnp.zeros((2, 2, 3)).at[..., 0].set(args.vx)

    @jax.jit
    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            state, _, done, info = env._step_impl(state, cmds, k)
            a = state.phys.agents
            return (state, key), (a.pos[..., 0] - eo[None, :1, 0],
                                  a.pos[..., 2],
                                  state.phys.npcs.q[:, 0, 0], done)

        return jax.lax.scan(body, (state, key), None, length=args.steps)[1]

    x, z, jq, done = rollout(state, jax.random.PRNGKey(1))
    x, z, jq = np.asarray(x), np.asarray(z), np.asarray(jq)
    for t in range(0, args.steps, 15):
        print(f"t={t*0.02:4.1f}s x={x[t,0].round(2).tolist()} "
              f"z={z[t,0].round(2).tolist()} plank_q={jq[t,0]:+.3f} "
              f"done={bool(np.asarray(done)[t,0])}")
    out = {
        "x_final": x[-1, 0].round(3).tolist(),
        "z_final": z[-1, 0].round(3).tolist(),
        "x_max": x[:, 0].max(0).round(3).tolist(),
        "plank_q_final": float(jq[-1, 0]),
        "terminated": bool(np.asarray(done).any()),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
