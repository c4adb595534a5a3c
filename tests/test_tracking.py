"""ENFORCED locomotion command-tracking bars (VERDICT r1 #2 / r2 #2).

The reference's frozen walk-these-ways policy tracks (vx, vy, yaw) commands
~1:1 (ref mqe/envs/go1/go1.py:389-409). This test pins the deployed stack
(go1plane, default residual backend = trot base + trained body_policy.npz)
against that contract on a command grid and FAILS if tracking regresses
below the measured round-3 level:

  round 1/2: v@1.0 = 0.74-0.75, never enforced
  round 3:   v@1.0 = 0.86, mean |err| vx 0.061 / vy 0.029 / wz 0.107
  round 4:   v@1.0 = 0.894, mean |err| vx 0.054 / vy 0.032 / wz 0.095
             (warm-started +200M with random fast command switches,
             tools/eval_tracking.py full 21-command grid, BENCHLOG.md)
  round 5:   v@1.0 = 0.924, mean |err| vx 0.032 / vy 0.017 / wz 0.090
             (+900M multi-gait continuation: per-episode gait sampling;
             pacing/bounding/pronking became functional with trot improved)

Bars are set with ~5% slack under the measured full-grid numbers; raise them
toward the ~1:1 reference contract as the policy improves.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqe_tpu.envs import make_mqe_env
from mqe_tpu.ops import quat as quat_ops

GRID = [
    (1.0, 0.0, 0.0),
    (-1.0, 0.0, 0.0),
    (0.5, 0.0, 0.0),
    (0.0, 0.5, 0.0),
    (0.0, 0.0, 1.0),
    (0.0, 0.0, -0.5),
    (0.6, 0.4, 0.0),
    (0.8, 0.0, -0.5),
    (0.0, 0.0, 0.0),
]
SECONDS = 3.0
SETTLE = 1.0

# Bars carry slack below the TPU-measured numbers on purpose: tests run on
# CPU (conftest pins jax_platforms=cpu) while eval_tracking measures on the
# real chip, and f32 matmul/reassociation differences between the two
# backends shift steady-state tracking by up to ~0.02 m/s in practice.
# The slack absorbs that cross-platform variance plus seed noise; a genuine
# regression (the 0.74-plateau class of bug) overshoots it by an order of
# magnitude.
V_AT_1MS_MIN = 0.90   # VERDICT r4 #3 target; measured 0.924 (CPU grid)
MEAN_ERR_VX_MAX = 0.05
MEAN_ERR_VY_MAX = 0.035
MEAN_ERR_WZ_MAX = 0.10


@pytest.mark.slow
def test_command_tracking_enforced():
    E = len(GRID)
    wrap, _ = make_mqe_env("go1plane", num_envs=E, seed=0)
    env = wrap.env
    assert env.body_policy_params is not None, (
        "deployed residual policy missing: mqe_tpu/assets/body_policy.npz"
    )
    cmds = jnp.asarray(GRID)[:, None, :]
    state, _ = env.reset(jax.random.PRNGKey(0))
    n_steps = int(round(SECONDS / env.dt))
    n_settle = int(round(SETTLE / env.dt))

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
            return (state, key), (v[:, 0], v[:, 1], ag.ang_vel[:, 0, 2], fell)

        (state, _), traj = jax.lax.scan(body, (state, key), None, length=n_steps)
        return traj

    vx, vy, wz, fell = rollout(state, jax.random.PRNGKey(1))
    vx, vy, wz = (np.asarray(a)[n_settle:].mean(0) for a in (vx, vy, wz))
    g = np.asarray(GRID)

    assert not np.asarray(fell).any(), "robot fell during tracking eval"
    i1 = GRID.index((1.0, 0.0, 0.0))
    assert vx[i1] >= V_AT_1MS_MIN, f"v@1.0 = {vx[i1]:.3f} < {V_AT_1MS_MIN}"
    err_vx = np.abs(vx - g[:, 0]).mean()
    err_vy = np.abs(vy - g[:, 1]).mean()
    err_wz = np.abs(wz - g[:, 2]).mean()
    assert err_vx <= MEAN_ERR_VX_MAX, f"mean |err| vx = {err_vx:.3f}"
    assert err_vy <= MEAN_ERR_VY_MAX, f"mean |err| vy = {err_vy:.3f}"
    assert err_wz <= MEAN_ERR_WZ_MAX, f"mean |err| wz = {err_wz:.3f}"


@pytest.mark.slow
def test_pacing_gait_floor():
    """Multi-gait contract (round 5): go1seesaw commands the PACING gait
    (ref go1_seesaw_config.py:91), and the r4 trot-only policy collapsed
    under it (0.09 m/s at a 0.5 command, falls — tools/probe_gait.py,
    BENCHLOG r5). The deployed policy must keep all library gaits
    functional; this pins pacing, the weakest, well above the collapse
    level (TPU-measured 0.34; CPU slack as above)."""
    E = 8

    def custom_cfg(cfg):
        class Cfg(cfg):
            class control(cfg.control):
                class default_command(cfg.control.default_command):
                    pass
        Cfg.control.default_command.gait = "pacing"
        return Cfg

    wrap, _ = make_mqe_env("go1plane", num_envs=E, seed=0,
                           custom_cfg=custom_cfg)
    env = wrap.env
    cmds = jnp.zeros((E, 1, 3)).at[..., 0].set(0.5)
    state, _ = env.reset(jax.random.PRNGKey(0))
    n_steps = int(round(3.0 / env.dt))
    n_settle = int(round(1.0 / env.dt))

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

        return jax.lax.scan(body, (state, key), None, length=n_steps)[1]

    vx, fell = rollout(state, jax.random.PRNGKey(1))
    v = np.asarray(vx)[n_settle:].mean()
    n_fell = int(np.asarray(fell).any(0).sum())
    assert v >= 0.22, f"pacing v@0.5 = {v:.3f} (trot-only collapse is ~0.09)"
    # pacing is the marginal gait and CPU physics sits slightly off the
    # TPU-measured point (1/16 falls there); the velocity floor above is
    # the collapse detector — the fall bar only catches gross instability
    assert n_fell <= 3, f"{n_fell}/8 envs fell under pacing"
