import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqe_tpu.ops import quat as q


def rand_quat(key, shape=()):
    v = jax.random.normal(key, shape + (4,))
    return q.quat_normalize(v)


def test_identity_rotate():
    v = jnp.array([1.0, 2.0, 3.0])
    qi = q.quat_identity()
    np.testing.assert_allclose(q.quat_rotate(qi, v), v, atol=1e-6)


def test_rotate_inverse_roundtrip():
    key = jax.random.PRNGKey(0)
    qq = rand_quat(key, (16,))
    v = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    out = q.quat_rotate_inverse(qq, q.quat_rotate(qq, v))
    np.testing.assert_allclose(out, v, atol=1e-5)


def test_matrix_consistency():
    key = jax.random.PRNGKey(2)
    qq = rand_quat(key, (8,))
    v = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
    m = q.quat_to_matrix(qq)
    np.testing.assert_allclose(
        jnp.einsum("bij,bj->bi", m, v), q.quat_rotate(qq, v), atol=1e-5
    )


def test_mul_compose():
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    qa, qb = rand_quat(k1, (8,)), rand_quat(k2, (8,))
    v = jax.random.normal(jax.random.PRNGKey(5), (8, 3))
    ab = q.quat_mul(qa, qb)
    np.testing.assert_allclose(
        q.quat_rotate(ab, v), q.quat_rotate(qa, q.quat_rotate(qb, v)), atol=1e-5
    )


def test_euler_roundtrip():
    rng = np.random.RandomState(0)
    roll = jnp.array(rng.uniform(-1.4, 1.4, 32))
    pitch = jnp.array(rng.uniform(-1.4, 1.4, 32))
    yaw = jnp.array(rng.uniform(-3.0, 3.0, 32))
    qq = q.quat_from_euler_xyz(roll, pitch, yaw)
    r2, p2, y2 = q.get_euler_xyz_wrapped(qq)
    np.testing.assert_allclose(r2, roll, atol=1e-5)
    np.testing.assert_allclose(p2, pitch, atol=1e-5)
    np.testing.assert_allclose(y2, yaw, atol=1e-5)


def test_get_euler_xyz_range():
    # matches isaacgym convention: outputs in [0, 2pi)
    qq = q.quat_from_euler_xyz(jnp.array(-0.3), jnp.array(0.0), jnp.array(0.0))
    r, p, y = q.get_euler_xyz(qq)
    assert r > np.pi  # -0.3 shows up as 2pi-0.3
    r_w = q.wrap_to_pi(r)
    np.testing.assert_allclose(r_w, -0.3, atol=1e-6)


def test_yaw_quat():
    # pure-yaw quat passes through exactly
    qq = q.quat_from_euler_xyz(jnp.array(0.0), jnp.array(0.0), jnp.array(1.1))
    yq = q.yaw_quat(qq)
    np.testing.assert_allclose(yq, qq, atol=1e-6)
    # with roll/pitch present the result is still a pure-yaw rotation
    qq = q.quat_from_euler_xyz(jnp.array(0.2), jnp.array(0.3), jnp.array(1.1))
    yq = q.yaw_quat(qq)
    r, p, _ = q.get_euler_xyz_wrapped(yq)
    np.testing.assert_allclose(r, 0.0, atol=1e-6)
    np.testing.assert_allclose(p, 0.0, atol=1e-6)


def test_quat_integrate_constant_omega():
    # rotate about z at 1 rad/s for 1s in 100 steps -> yaw == 1
    qq = q.quat_identity()
    omega = jnp.array([0.0, 0.0, 1.0])
    for _ in range(100):
        qq = q.quat_integrate(qq, omega, 0.01)
    _, _, yaw = q.get_euler_xyz_wrapped(qq)
    np.testing.assert_allclose(yaw, 1.0, atol=1e-4)


def test_wrap_to_pi():
    a = jnp.array([0.0, np.pi, -np.pi, 3 * np.pi, -2.5 * np.pi])
    w = q.wrap_to_pi(a)
    assert np.all(np.asarray(w) <= np.pi + 1e-7)
    assert np.all(np.asarray(w) > -np.pi - 1e-7)
    np.testing.assert_allclose(np.cos(w), np.cos(a), atol=1e-6)
    np.testing.assert_allclose(np.sin(w), np.sin(a), atol=1e-6)


def test_box_minus():
    qa = q.quat_from_euler_xyz(jnp.array(0.0), jnp.array(0.0), jnp.array(0.5))
    qb = q.quat_identity()
    rv = q.quat_box_minus(qa, qb)
    np.testing.assert_allclose(rv, jnp.array([0.0, 0.0, 0.5]), atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
