"""Physics-core validation against analytic cases (SURVEY.md §4 test strategy).

- free fall / torque-free spin of a single free body
- pendulum vs closed-form small-oscillation frequency and energy conservation
- momentum conservation of the full go1 tree under internal torques
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqe_tpu.ops import quat as quat_ops
from mqe_tpu.physics import dynamics, integrator, spatial
from mqe_tpu.physics.model import BodyModel, go1_model, load_model

G = jnp.array([0.0, 0.0, -9.81])


def gravity_wrench(model, Ispat, Rw, pw):
    """(nb,6) world wrench from gravity about each body origin."""
    out = []
    for i in range(model.nb):
        m = float(model.mass[i])
        com_w = Rw[i] @ jnp.asarray(model.com[i], dtype=jnp.float32)
        f = m * G
        n = jnp.cross(com_w, f)
        out.append(jnp.concatenate([n, f]))
    return jnp.stack(out)


def make_pendulum(axis=(0.0, 1.0, 0.0), length=1.0, mass=1.0) -> BodyModel:
    """Fixed root + single revolute joint, point mass at distance `length`."""
    nb = 2
    return BodyModel(
        name="pendulum",
        nb=nb,
        nq=1,
        root_free=False,
        parent=np.array([-1, 0], dtype=np.int32),
        joint_type=np.array([0, 1], dtype=np.int32),
        joint_pos=np.zeros((nb, 3)),
        joint_rot=np.tile(np.eye(3), (nb, 1, 1)),
        joint_axis=np.array([[0.0, 0.0, 0.0], list(axis)]),
        mass=np.array([0.0, mass]),
        com=np.array([[0.0, 0.0, 0.0], [0.0, 0.0, -length]]),
        inertia=np.zeros((nb, 3, 3)),
        q_lower=np.array([-1e9]),
        q_upper=np.array([1e9]),
        qd_limit=np.array([1e9]),
        tau_limit=np.array([0.0]),
        joint_damping=np.array([0.0]),
        joint_names=("hinge",),
        body_names=("root", "bob"),
        sph_body=np.zeros(0, dtype=np.int32),
        sph_pos=np.zeros((0, 3)),
        sph_radius=np.zeros(0),
        sph_tags=(),
        prim_body=np.zeros(0, dtype=np.int32),
        prim_kind=np.zeros(0, dtype=np.int32),
        prim_pos=np.zeros((0, 3)),
        prim_rot=np.zeros((0, 3, 3)),
        prim_size=np.zeros((0, 3)),
        prim_tags=(),
    )


def step_free(model, Ispat, state, tau, dt, with_gravity=True):
    base_pos, base_quat, lv, av, q, qd = state
    Rw, pw, X_up, S, _, _ = dynamics.kinematics(model, base_pos, base_quat, q)
    f_ext = gravity_wrench(model, Ispat, Rw, pw) if with_gravity else jnp.zeros((model.nb, 6))
    wd, ad, qdd, _ = dynamics.forward_dynamics(
        model, Ispat, base_pos, base_quat, lv, av, q, qd, tau, f_ext
    )
    return integrator.integrate(model, base_pos, base_quat, lv, av, q, qd, wd, ad, qdd, dt)


def test_free_fall():
    model = load_model("ball")
    Ispat = jnp.asarray(model.spatial_inertia, dtype=jnp.float32)
    state = (
        jnp.array([0.0, 0.0, 10.0]),
        quat_ops.quat_identity(),
        jnp.zeros(3),
        jnp.zeros(3),
        jnp.zeros(0),
        jnp.zeros(0),
    )
    dt = 0.005
    for _ in range(100):
        state = step_free(model, Ispat, state, jnp.zeros(0), dt)
    t = 100 * dt
    # semi-implicit Euler: z = z0 - g*dt*(1+2+...+n) = z0 - g dt^2 n(n+1)/2
    expected_z = 10.0 - 9.81 * dt * dt * 100 * 101 / 2
    np.testing.assert_allclose(state[0][2], expected_z, atol=1e-3)
    np.testing.assert_allclose(state[2][2], -9.81 * t, atol=1e-3)


def test_torque_free_spin():
    model = load_model("ball")
    Ispat = jnp.asarray(model.spatial_inertia, dtype=jnp.float32)
    omega0 = jnp.array([1.0, 2.0, 3.0])
    state = (jnp.zeros(3), quat_ops.quat_identity(), jnp.zeros(3), omega0, jnp.zeros(0), jnp.zeros(0))
    for _ in range(200):
        state = step_free(model, Ispat, state, jnp.zeros(0), 0.005, with_gravity=False)
    np.testing.assert_allclose(state[3], omega0, atol=1e-4)


def test_pendulum_small_oscillation():
    model = make_pendulum()
    Ispat = jnp.asarray(model.spatial_inertia, dtype=jnp.float32)
    dt = 0.001
    theta0 = 0.05
    state = (
        jnp.zeros(3),
        quat_ops.quat_identity(),
        jnp.zeros(3),
        jnp.zeros(3),
        jnp.array([theta0]),
        jnp.zeros(1),
    )
    period = 2 * np.pi * np.sqrt(1.0 / 9.81)
    n = int(period / dt)
    traj = []
    for _ in range(n):
        state = step_free(model, Ispat, state, jnp.zeros(1), dt)
        traj.append(float(state[4][0]))
    # after one period the angle returns near theta0
    assert abs(traj[-1] - theta0) < 0.005, traj[-1]
    # amplitude bounded (no energy explosion)
    assert max(np.abs(traj)) < theta0 * 1.05


def test_pendulum_energy_conservation():
    model = make_pendulum()
    Ispat = jnp.asarray(model.spatial_inertia, dtype=jnp.float32)
    dt = 0.001

    def energy(q, qd):
        h = -np.cos(q)  # com height
        return 0.5 * qd**2 + 9.81 * (h + 1.0)

    state = (jnp.zeros(3), quat_ops.quat_identity(), jnp.zeros(3), jnp.zeros(3), jnp.array([1.0]), jnp.zeros(1))
    e0 = energy(1.0, 0.0)
    for _ in range(2000):
        state = step_free(model, Ispat, state, jnp.zeros(1), dt)
    e1 = energy(float(state[4][0]), float(state[5][0]))
    assert abs(e1 - e0) / e0 < 0.02, (e0, e1)


def test_go1_momentum_conservation_instantaneous():
    """d/dt of total momentum along the computed state derivative must vanish
    for internal joint torques in free space (exact property of correct
    floating-base dynamics, checked via jvp)."""
    model = go1_model()
    Ispat = jnp.asarray(model.spatial_inertia, dtype=jnp.float32)
    base_pos = jnp.array([0.0, 0.0, 5.0])
    base_quat = quat_ops.quat_normalize(jnp.array([0.1, -0.2, 0.3, 0.9]))
    lv = jnp.array([0.3, -0.1, 0.2])
    av = jnp.array([0.5, 0.4, -0.3])
    q0 = jnp.asarray((model.q_lower + model.q_upper) / 2, dtype=jnp.float32)
    qd = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (12,))
    tau = 3.0 * jax.random.normal(jax.random.PRNGKey(1), (12,))

    wd, ad, qdd, _ = dynamics.forward_dynamics(
        model, Ispat, base_pos, base_quat, lv, av, q0, qd, tau, jnp.zeros((model.nb, 6))
    )

    def mom(base_pos, base_quat, lv, av, q, qd):
        return jnp.concatenate(
            dynamics.total_momentum(model, Ispat, base_pos, base_quat, lv, av, q, qd)
        )

    def quat_dot(qt, w):
        wq = jnp.concatenate([w, jnp.zeros(1)])
        return 0.5 * quat_ops.quat_mul(wq, qt)

    primals = (base_pos, base_quat, lv, av, q0, qd)
    tangents = (lv, quat_dot(base_quat, av), ad, wd, qd, qdd)
    h0, dh = jax.jvp(mom, primals, tangents)
    scale = float(jnp.abs(h0).max()) + 1.0
    np.testing.assert_allclose(np.asarray(dh) / scale, np.zeros(6), atol=1e-4)


def test_go1_momentum_drift_small():
    """Discrete rollout: momentum drift stays small at fine dt."""
    model = go1_model()
    Ispat = jnp.asarray(model.spatial_inertia, dtype=jnp.float32)
    q0 = jnp.asarray((model.q_lower + model.q_upper) / 2, dtype=jnp.float32)
    state = (
        jnp.array([0.0, 0.0, 5.0]),
        quat_ops.quat_identity(),
        jnp.array([0.3, -0.1, 0.2]),
        jnp.array([0.1, 0.05, -0.08]),
        q0,
        jnp.zeros(12),
    )

    def mom(state):
        return dynamics.total_momentum(
            model, Ispat, state[0], state[1], state[2], state[3], state[4], state[5]
        )

    h_ang0, h_lin0 = mom(state)
    tau = 1.0 * jax.random.normal(jax.random.PRNGKey(1), (12,))

    @jax.jit
    def rollout(state):
        def body(state, _):
            base_pos, base_quat, lv, av, q, qd = state
            wd, ad, qdd, _ = dynamics.forward_dynamics(
                model, Ispat, base_pos, base_quat, lv, av, q, qd, tau,
                jnp.zeros((model.nb, 6)),
            )
            state = integrator.integrate(
                model, base_pos, base_quat, lv, av, q, qd, wd, ad, qdd, 1e-4
            )
            return state, None

        state, _ = jax.lax.scan(body, state, None, length=100)
        return state

    state = rollout(state)
    h_ang1, h_lin1 = mom(state)
    np.testing.assert_allclose(h_lin1, h_lin0, atol=5e-3)
    np.testing.assert_allclose(h_ang1, h_ang0, atol=5e-2)


def test_go1_composite_mass():
    model = go1_model()
    # go1 trunk+legs mass should be ~12kg (datasheet); sanity vs URDF sum
    assert 10.0 < model.mass.sum() < 15.0, model.mass.sum()
    assert model.nb == 13 and model.nq == 12


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
