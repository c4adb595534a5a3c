"""Locomotion layer tests: gait clocks (reference `_step_contact_targets`
semantics), leg IK exactness, actuator net behavior, end-to-end trot walking."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqe_tpu.control.locomotion import (
    CLOCK_TO_LEG,
    LEG_SIGN_Y,
    TrotController,
    leg_fk,
    leg_ik,
    step_gait_clocks,
)
from mqe_tpu.control.nets import ActuatorNet, AdaptationModule

Q0 = np.array([-0.1, 0.8, -1.5, 0.1, 0.8, -1.5, -0.1, 1.0, -1.5, 0.1, 1.0, -1.5])


def test_gait_clocks_trot_pairs():
    gi = jnp.asarray(0.0)
    z = jnp.asarray(0.0)
    gi, idx, clock, dbl, half = step_gait_clocks(
        gi, 0.1, jnp.asarray(1.0), jnp.asarray(0.5), z, z, jnp.asarray(0.5)
    )
    # trot: FL & RR share phase, FR & RL share phase, half a cycle apart
    np.testing.assert_allclose(idx[0], idx[3], atol=1e-6)
    np.testing.assert_allclose(idx[1], idx[2], atol=1e-6)
    np.testing.assert_allclose(abs(idx[0] - idx[1]), 0.5, atol=1e-6)
    assert clock.shape == (4,)


def test_gait_clock_duration_remap():
    # duration 0.7: raw phase < 0.7 maps to [0, 0.5) (stance)
    gi0 = jnp.asarray(0.6)
    z = jnp.asarray(0.0)
    _, idx, *_ = step_gait_clocks(gi0, 0.0, jnp.asarray(0.0), z, z, z, jnp.asarray(0.7))
    # raw phase 0.6 -> stance sub-phase 0.6/0.7*0.5
    np.testing.assert_allclose(idx[1], 0.6 / 0.7 * 0.5, atol=1e-5)


def test_leg_ik_fk_roundtrip():
    rng = np.random.RandomState(1)
    for leg in range(4):
        s = LEG_SIGN_Y[leg]
        q = np.stack(
            [rng.uniform(-0.6, 0.6, 300), rng.uniform(-0.8, 2.5, 300), rng.uniform(-2.4, -1.0, 300)],
            -1,
        )
        p = leg_fk(jnp.asarray(q), s)
        q1, q2, q3 = leg_ik(p, s)
        p2 = leg_fk(jnp.stack([q1, q2, q3], -1), s)
        assert float(jnp.abs(p2 - p).max()) < 1e-3


def test_actuator_net_feedback_sign():
    anet = ActuatorNet()
    z = jnp.zeros(12)
    e = jnp.full((12,), 0.3)
    # the trained net reacts to the PREVIOUS substep's error (one-step
    # actuation delay baked into the hardware data it was fit on)
    tau_pos = anet(e, e, e, z, z, z)
    tau_neg = anet(-e, -e, -e, z, z, z)
    assert float(tau_pos.max()) < -3.0   # positive error -> negative torque
    assert float(tau_neg.min()) > 3.0
    # velocity damping
    v = jnp.full((12,), 2.0)
    tau_v = anet(z, z, z, v, v, v)
    assert float(tau_v.max()) < 0.0


def test_adaptation_module_shapes():
    m = AdaptationModule()
    out = m(jnp.zeros((5, 2100)))
    assert out.shape == (5, 2)


def test_trot_action_default_posture():
    trot = TrotController(default_q=Q0, body_height=0.28)
    gait = dict(
        freq=jnp.asarray(3.0),
        duration=jnp.asarray(0.5),
        swing_height=jnp.asarray(0.0),
        stance_width=jnp.asarray(0.25),
        body_height_delta=jnp.asarray(0.0),
        stance_length=jnp.asarray(0.428),
    )
    # zero command, all-stance: action should be a small crouch offset
    a = trot(jnp.zeros(3), jnp.full((4,), 0.25), gait)
    assert a.shape == (12,)
    assert float(jnp.abs(a).max()) < 2.0  # near default posture


@pytest.mark.slow
def test_trot_walks_forward():
    """End-to-end: trot backend moves the robot forward and keeps it upright
    (this is the physics-level go1plane smoke, ref root test.py behavior)."""
    from mqe_tpu.ops import quat as quat_ops
    from mqe_tpu.physics import scene as S
    from mqe_tpu.physics.model import go1_model

    anet = ActuatorNet()
    robot = go1_model()
    q0 = jnp.asarray(Q0, dtype=jnp.float32)
    trot = TrotController(default_q=Q0, body_height=0.28)
    sc = S.SceneModel(robot=robot, num_agents=1)
    terrain = S.Terrain(
        height=jnp.zeros((4, 4)),
        origin=jnp.array([-100.0, -100.0]),
        scale=jnp.asarray(66.0),
        boxes=jnp.zeros((S.MAX_ENV_BOXES, 7)),
        static_geoms=jnp.zeros((0, 8)),
    )
    dr = S.DomainRand(jnp.asarray(1.0), jnp.zeros(1), jnp.zeros((1, 3)), jnp.ones((1, 12)))
    npcs = S.ActorState(
        jnp.zeros((0, 3)), jnp.zeros((0, 4)), jnp.zeros((0, 3)), jnp.zeros((0, 3)),
        jnp.zeros((0, 0)), jnp.zeros((0, 0)),
    )
    TL = jnp.asarray([20.0, 20.0, 25.0] * 4)
    gait = dict(
        freq=jnp.asarray(3.0),
        duration=jnp.asarray(0.5),
        swing_height=jnp.asarray(0.12),
        stance_width=jnp.asarray(0.25),
        body_height_delta=jnp.asarray(0.0),
        stance_length=jnp.asarray(0.428),
    )
    cmd = jnp.array([1.0, 0.0, 0.0])
    st = S.PhysState(
        agents=S.ActorState(
            jnp.array([[0.0, 0.0, 0.30]]), quat_ops.quat_identity((1,)),
            jnp.zeros((1, 3)), jnp.zeros((1, 3)), q0[None], jnp.zeros((1, 12)),
        ),
        npcs=npcs,
    )

    @jax.jit
    def cstep(carry, _):
        st, gi, hist = carry
        gi, idx, *_ = step_gait_clocks(
            gi, 0.02, gait["freq"], jnp.asarray(0.5), jnp.asarray(0.0),
            jnp.asarray(0.0), gait["duration"],
        )
        idx_legs = idx[jnp.asarray(CLOCK_TO_LEG)]
        r, p, _ = quat_ops.get_euler_xyz_wrapped(st.agents.quat[0])
        yawq = quat_ops.yaw_quat(st.agents.quat[0])
        v_yaw = quat_ops.quat_rotate_inverse(yawq, st.agents.lin_vel[0])
        action = trot(cmd, idx_legs, gait, roll=r, pitch=p, v_meas=v_yaw[:2],
                      w_meas=st.agents.ang_vel[0, 2])
        target = action * 0.25 * jnp.asarray([0.5, 1, 1] * 4) + q0

        def sub(carry, _):
            st, hist = carry
            err = st.agents.q[0] - target
            vel = st.agents.qd[0]
            tau = jnp.clip(
                anet(err, hist[0], hist[1], vel, hist[2], hist[3])
                - trot.TAU_KP * err - trot.TAU_KD * vel,
                -TL, TL,
            )
            hist = jnp.stack([err, hist[0], vel, hist[2]])
            for _ in range(2):
                st, _ = S.substep(sc, terrain, st, tau[None], jnp.zeros((0, 0)), dr, 0.0025)
            return (st, hist), None

        (st, hist), _ = jax.lax.scan(sub, (st, hist), None, length=4)
        r2, _, _ = quat_ops.get_euler_xyz_wrapped(st.agents.quat[0])
        return (st, gi, hist), (st.agents.pos[0], r2)

    (stf, _, _), (poss, rolls) = jax.lax.scan(
        cstep, (st, jnp.asarray(0.0), jnp.zeros((4, 12))), None, length=200
    )
    poss = np.asarray(poss)
    assert poss[-1, 0] > 0.8, poss[-1]          # moved forward >0.8m in 4s
    assert poss[:, 2].min() > 0.15              # never collapsed
    assert float(jnp.abs(jnp.asarray(rolls)).max()) < 0.5  # stayed upright


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
