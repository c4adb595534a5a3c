"""Record golden trajectories as physics-regression anchors (VERDICT r1 #9).

Three scenarios exercising the contact + dynamics stack end-to-end:
  drop  — go1 released above the plane, passive PD stand (settling transient)
  walk  — go1 under a constant (1, 0, 0) command for 100 control steps
  push  — go1pushbox: agents drive forward into the box NPC

Run on CPU (the platform the test suite uses) and committed to
tests/goldens/*.npz. tests/test_golden_traj.py replays each scenario and
asserts the trajectory stays within tolerance — failing on any contact-model
or integrator drift. Contact parameters are the calibrated penalty-model
equivalents of the reference PhysX solver block
(ref mqe/envs/base/legged_robot_config.py:211-229; see PARITY.md §physics).

Usage: JAX_PLATFORMS=cpu python tools/make_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def rollout(task, steps, vx, num_envs=2, record_npc=False):
    from mqe_tpu.envs import make_mqe_env

    wrap, _ = make_mqe_env(task, num_envs=num_envs, seed=0)
    key = jax.random.PRNGKey(42)
    ts, _ = wrap.reset(key)
    A = getattr(wrap, "controlled_agents", wrap.num_agents)
    actions = jnp.zeros((num_envs, A, 3)).at[..., 0].set(vx)

    def body(carry, _):
        ts, key = carry
        key, k = jax.random.split(key)
        ts, obs, rew, done, info = wrap._step_impl(ts, actions, k)
        ag = ts.env.phys.agents
        rec = dict(pos=ag.pos, quat=ag.quat, q=ag.q)
        if record_npc:
            rec["npc_pos"] = ts.env.phys.npcs.pos
        return (ts, key), rec

    (ts, _), recs = jax.lax.scan(body, (ts, key), None, length=steps)
    return {k: np.asarray(v) for k, v in recs.items()}


def drop_rollout(steps=60):
    """Spawn 0.2 m higher than nominal and let the robot settle."""
    from mqe_tpu.envs.go1_env import Go1Env
    from mqe_tpu.envs.tasks import Go1PlaneCfg

    class DropCfg(Go1PlaneCfg):
        class init_state(Go1PlaneCfg.init_state):
            pos = [0.0, 0.0, 0.62]

        class domain_rand(Go1PlaneCfg.domain_rand):
            init_base_pos_range = dict(x=[0.0, 0.0], y=[0.0, 0.0])
            init_base_vel_range = [0.0, 0.0]
            init_dof_pos_ratio_range = [1.0, 1.0]

        class termination(Go1PlaneCfg.termination):
            termination_terms = []

    env = Go1Env(DropCfg, num_envs=2, seed=0)
    state = env._reset_all(jax.random.PRNGKey(42))
    cmds = jnp.zeros((2, 1, 3))

    def body(carry, _):
        state, key = carry
        key, k = jax.random.split(key)
        state, obs, done, info = env._step(state, cmds, k)
        ag = state.phys.agents
        return (state, key), dict(pos=ag.pos, quat=ag.quat, q=ag.q)

    (_, _), recs = jax.lax.scan(body, (state, jax.random.PRNGKey(1)), None, length=steps)
    return {k: np.asarray(v) for k, v in recs.items()}


def main():
    os.makedirs(OUT, exist_ok=True)
    np.savez(os.path.join(OUT, "drop.npz"), **drop_rollout())
    print("drop done", flush=True)
    np.savez(os.path.join(OUT, "walk.npz"), **rollout("go1plane", 100, 0.5, 1))
    print("walk done", flush=True)
    np.savez(os.path.join(OUT, "push.npz"),
             **rollout("go1pushbox", 80, 0.5, 2, record_npc=True))
    print("push done", flush=True)


if __name__ == "__main__":
    main()
