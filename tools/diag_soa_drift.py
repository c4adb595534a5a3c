"""Diagnose whether SoA-vs-AoS golden drift is a real model bug or f32 chaos.

Replays the golden 'drop' scenario on the AoS path and, at EVERY substep,
also applies one SoA substep to the SAME input state, comparing outputs.
Because state is resynced to the AoS trajectory each substep, chaotic
amplification cannot accumulate: a persistent per-substep deviation above
float-reassociation noise (~1e-4) indicates a genuine SoA model bug; diffs
at noise level mean the golden drift is pure trajectory chaos and the
goldens should simply be re-recorded on the SoA (product) path.

Usage: JAX_PLATFORMS=cpu python tools/diag_soa_drift.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mqe_tpu.physics import scene as S  # noqa: E402


def main():
    import dataclasses

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
    scene_aos = dataclasses.replace(env.scene, use_soa=False)
    scene_soa = dataclasses.replace(env.scene, use_soa=True)
    dt = env.cfg.sim.dt / getattr(env.cfg.sim, "subiters", 1)
    subiters = getattr(env.cfg.sim, "subiters", 1)
    print(f"dt={env.cfg.sim.dt} subiters={subiters}", flush=True)

    state = env._reset_all(jax.random.PRNGKey(42))
    cmds = jnp.zeros((2, 1, 3))

    # run the full env step on the AoS path, but intercept physics states:
    # simplest robust approach — at the *whole-env-step* level, take the AoS
    # trajectory state_t, apply env._step once with each scene, compare.
    key = jax.random.PRNGKey(1)

    def step_with(scene, st, k):
        old = env.scene
        object.__setattr__(env, "scene", scene)
        try:
            out = env._step_impl(st, cmds, k)
        finally:
            object.__setattr__(env, "scene", old)
        return out

    step_aos = jax.jit(lambda st, k: step_with(scene_aos, st, k)[0])
    step_soa = jax.jit(lambda st, k: step_with(scene_soa, st, k)[0])

    worst = {}
    for t in range(60):
        key, k = jax.random.split(key)
        nxt_aos = step_aos(state, k)
        nxt_soa = step_soa(state, k)
        for name in ["pos", "quat", "lin_vel", "ang_vel", "q", "qd"]:
            a = np.asarray(getattr(nxt_aos.phys.agents, name))
            s = np.asarray(getattr(nxt_soa.phys.agents, name))
            d = np.abs(a - s).max()
            if d > worst.get(name, (0, -1))[0]:
                worst[name] = (d, t)
        state = nxt_aos  # resync to AoS trajectory
        if t % 10 == 0:
            print(f"t={t:3d} " + " ".join(
                f"{n}={worst.get(n,(0,-1))[0]:.2e}" for n in
                ["pos", "quat", "lin_vel", "ang_vel", "q", "qd"]), flush=True)

    print("\nworst per-step diff over 60 control steps (4 substeps each):")
    for n, (d, t) in worst.items():
        print(f"  {n:8s} {d:.3e} at t={t}")


if __name__ == "__main__":
    main()
