"""Full-episode SoA-vs-AoS physics equivalence (VERDICT r2 #1).

test_soa.py checks single substeps on random states; this test pins the two
formulations against each other over a complete contact-rich drop episode
(spawn 0.2 m high -> touchdown transient -> settle), resyncing the state to
the AoS trajectory every control step so chaotic divergence cannot
accumulate. A persistent per-step deviation above float-reassociation noise
would mean a real SoA model bug; the committed bounds are ~10x the measured
worst-case noise (tools/diag_soa_drift.py, round 3: pos 8.9e-8, qd 2.3e-3,
peaking only during touchdown).

Reference fidelity anchor: the solver block the penalty contact model was
calibrated against (ref mqe/envs/base/legged_robot_config.py:211-229).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# ~10x headroom over measured CPU f32 reassociation noise
TOLS = dict(pos=1e-6, quat=1e-5, lin_vel=3e-4, ang_vel=5e-3, q=2e-4, qd=2e-2)
STEPS = 30  # covers the contact-rich touchdown transient (t ~ 12-18)


def test_soa_matches_aos_full_drop_episode():
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
    cmds = jnp.zeros((2, 1, 3))

    def step_with(scene, st, k):
        old = env.scene
        object.__setattr__(env, "scene", scene)
        try:
            out = env._step_impl(st, cmds, k)
        finally:
            object.__setattr__(env, "scene", old)
        return out[0]

    step_aos = jax.jit(lambda st, k: step_with(scene_aos, st, k))
    step_soa = jax.jit(lambda st, k: step_with(scene_soa, st, k))

    state = env._reset_all(jax.random.PRNGKey(42))
    key = jax.random.PRNGKey(1)
    worst = {n: 0.0 for n in TOLS}
    for _ in range(STEPS):
        key, k = jax.random.split(key)
        nxt_aos = step_aos(state, k)
        nxt_soa = step_soa(state, k)
        for name, tol in TOLS.items():
            a = np.asarray(getattr(nxt_aos.phys.agents, name))
            s = np.asarray(getattr(nxt_soa.phys.agents, name))
            worst[name] = max(worst[name], float(np.abs(a - s).max()))
        state = nxt_aos  # resync: compare one-step maps, not trajectories

    for name, tol in TOLS.items():
        assert worst[name] < tol, (
            f"SoA-vs-AoS per-step {name} deviation {worst[name]:.3e} "
            f"exceeds bound {tol:.1e} — possible SoA model bug"
        )
