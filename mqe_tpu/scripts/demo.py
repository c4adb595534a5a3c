"""Smoke/demo CLI mirroring the reference's root test.py (ref test.py:31-71):
constructs a task, steps constant commands, prints state stats.

  python -m mqe_tpu.scripts.demo --task go1gate --num-envs 4 --seconds 5
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="go1gate")
    p.add_argument("--num-envs", type=int, default=4)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--vx", type=float, default=0.5)
    p.add_argument("--vy", type=float, default=0.0)
    p.add_argument("--yaw", type=float, default=0.0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mqe_tpu.envs import make_mqe_env

    wrap, cfg = make_mqe_env(args.task, num_envs=args.num_envs, seed=0)
    A = getattr(wrap, "controlled_agents", wrap.num_agents)
    print(f"task={args.task} envs={wrap.num_envs} agents={wrap.num_agents} "
          f"npcs={wrap.num_npcs} obs_dim={wrap.obs_dim}", flush=True)

    key = jax.random.PRNGKey(0)
    ts, obs = wrap.reset(key)
    acts = jnp.tile(jnp.array([args.vx, args.vy, args.yaw]), (args.num_envs, A, 1))
    n = int(args.seconds / wrap.env.dt)
    total_rew = 0.0
    dones = 0
    for i in range(n):
        key, k = jax.random.split(key)
        ts, obs, rew, done, info = wrap.step(ts, acts, k)
        total_rew += float(np.asarray(rew).sum())
        dones += int(np.asarray(done).sum())
        if i % 50 == 49:
            pos = np.asarray(ts.env.phys.agents.pos[0])
            print(
                f"t={(i + 1) * wrap.env.dt:5.2f}s agent0 pos={pos[0].round(2)} "
                f"reward_sum={total_rew:.2f} resets={dones}",
                flush=True,
            )
    print(f"done: {n} steps, total reward {total_rew:.2f}, resets {dones}")


if __name__ == "__main__":
    main()
