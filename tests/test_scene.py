"""Scene-level contact + dynamics tests: resting objects, go1 drop on flat
ground (the reference's implicit install check is `test.py` stepping go1 on a
plane — this is its physics substrate)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqe_tpu.ops import quat as quat_ops
from mqe_tpu.physics import scene as S
from mqe_tpu.physics.model import go1_model, load_model

A_DEFAULT_Q = np.array([-0.1, 0.8, -1.5, 0.1, 0.8, -1.5, -0.1, 1.0, -1.5, 0.1, 1.0, -1.5])
# FR,FL,RR,RL x hip,thigh,calf (ref go1_config.py:86-103 default_joint_angles)


def flat_terrain(dtype=jnp.float32):
    return S.Terrain(
        height=jnp.zeros((4, 4), dtype=dtype),
        origin=jnp.array([-100.0, -100.0], dtype=dtype),
        scale=jnp.asarray(66.0, dtype=dtype),
        boxes=jnp.zeros((S.MAX_ENV_BOXES, 7), dtype=dtype),
        static_geoms=jnp.zeros((0, 8), dtype=dtype),
    )


def no_dr(A, nq):
    return S.DomainRand(
        mu_scale=jnp.asarray(1.0),
        payload=jnp.zeros(A),
        com_shift=jnp.zeros((A, 3)),
        motor_strength=jnp.ones((A, nq)),
    )


def empty_npcs(dtype=jnp.float32):
    z = lambda *s: jnp.zeros(s, dtype=dtype)
    return S.ActorState(z(0, 3), z(0, 4), z(0, 3), z(0, 3), z(0, 0), z(0, 0))


def test_ball_rests_on_ground():
    ball = load_model("ball")
    sc = S.SceneModel(robot=ball, num_agents=1)
    terrain = flat_terrain()
    st = S.PhysState(
        agents=S.ActorState(
            pos=jnp.array([[0.0, 0.0, 0.5]]),
            quat=quat_ops.quat_identity((1,)),
            lin_vel=jnp.zeros((1, 3)),
            ang_vel=jnp.zeros((1, 3)),
            q=jnp.zeros((1, 0)),
            qd=jnp.zeros((1, 0)),
        ),
        npcs=empty_npcs(),
    )
    dr = no_dr(1, 0)

    @jax.jit
    def roll(st):
        def body(st, _):
            st, _ = S.substep(sc, terrain, st, jnp.zeros((1, 0)), jnp.zeros((0, 0)), dr, 0.0025)
            return st, None

        st, _ = jax.lax.scan(body, st, None, length=1200)
        return st

    st = roll(st)
    z = float(st.agents.pos[0, 2])
    # ball radius 0.1; rests at ~0.1 minus small penetration
    assert 0.08 < z < 0.11, z
    assert abs(float(st.agents.lin_vel[0, 2])) < 0.05


def test_go1_drop_settles_upright():
    robot = go1_model()
    sc = S.SceneModel(robot=robot, num_agents=1)
    terrain = flat_terrain()
    q0 = jnp.asarray(A_DEFAULT_Q, dtype=jnp.float32)
    st = S.PhysState(
        agents=S.ActorState(
            pos=jnp.array([[0.0, 0.0, 0.42]]),
            quat=quat_ops.quat_identity((1,)),
            lin_vel=jnp.zeros((1, 3)),
            ang_vel=jnp.zeros((1, 3)),
            q=q0[None],
            qd=jnp.zeros((1, 12)),
        ),
        npcs=empty_npcs(),
    )
    dr = no_dr(1, 12)
    kp, kd = 20.0, 0.5

    @jax.jit
    def roll(st):
        def body(st, _):
            tau = kp * (q0[None] - st.agents.q) - kd * st.agents.qd
            tau = jnp.clip(tau, -33.5, 33.5)
            st, contacts = S.substep(sc, terrain, st, tau, jnp.zeros((0, 0)), dr, 0.0025)
            return st, st.agents.pos[0, 2]

        st, zs = jax.lax.scan(body, st, None, length=1200)
        return st, zs

    st, zs = roll(st)
    z = float(st.agents.pos[0, 2])
    # standing height ~0.30 for go1 at default angles
    assert 0.22 < z < 0.38, (z, np.asarray(zs[-50:]))
    g_body = quat_ops.quat_rotate_inverse(st.agents.quat[0], jnp.array([0.0, 0.0, -1.0]))
    assert float(g_body[2]) < -0.95, g_body  # upright
    assert float(jnp.abs(st.agents.qd).max()) < 2.0


def test_go1_feet_contact_forces():
    robot = go1_model()
    sc = S.SceneModel(robot=robot, num_agents=1)
    terrain = flat_terrain()
    q0 = jnp.asarray(A_DEFAULT_Q, dtype=jnp.float32)
    st = S.PhysState(
        agents=S.ActorState(
            pos=jnp.array([[0.0, 0.0, 0.32]]),
            quat=quat_ops.quat_identity((1,)),
            lin_vel=jnp.zeros((1, 3)),
            ang_vel=jnp.zeros((1, 3)),
            q=q0[None],
            qd=jnp.zeros((1, 12)),
        ),
        npcs=empty_npcs(),
    )
    dr = no_dr(1, 12)

    @jax.jit
    def roll(st):
        def body(st, _):
            tau = 20.0 * (q0[None] - st.agents.q) - 0.5 * st.agents.qd
            st, contacts = S.substep(sc, terrain, st, tau, jnp.zeros((0, 0)), dr, 0.0025)
            return st, contacts.feet_force

        return jax.lax.scan(body, st, None, length=800)

    st, ff = roll(st)
    total_up = float(ff[-1, 0, :, 2].sum())
    weight = float(robot.mass.sum() * 9.81)
    # settled: feet carry the robot's weight
    assert abs(total_up - weight) / weight < 0.25, (total_up, weight)


def test_wall_box_blocks_motion():
    ball = load_model("ball")
    sc = S.SceneModel(robot=ball, num_agents=1)
    boxes = jnp.zeros((S.MAX_ENV_BOXES, 7)).at[0].set(
        jnp.array([1.0, 0.0, 0.25, 0.1, 1.0, 0.25, 1.0])
    )
    terrain = flat_terrain().replace(boxes=boxes)
    st = S.PhysState(
        agents=S.ActorState(
            pos=jnp.array([[0.0, 0.0, 0.1]]),
            quat=quat_ops.quat_identity((1,)),
            lin_vel=jnp.array([[2.0, 0.0, 0.0]]),
            ang_vel=jnp.zeros((1, 3)),
            q=jnp.zeros((1, 0)),
            qd=jnp.zeros((1, 0)),
        ),
        npcs=empty_npcs(),
    )
    dr = no_dr(1, 0)

    @jax.jit
    def roll(st):
        def body(st, _):
            st, _ = S.substep(sc, terrain, st, jnp.zeros((1, 0)), jnp.zeros((0, 0)), dr, 0.0025)
            return st, None

        st, _ = jax.lax.scan(body, st, None, length=800)
        return st

    st = roll(st)
    # ball rolls toward wall at x=1 (face at 0.9) and must not pass through
    assert float(st.agents.pos[0, 0]) < 0.92, st.agents.pos


def test_flat_plane_fast_path_matches_heightfield():
    """sphere_plane (flat-terrain fast path) == sphere_heightfield on a
    constant field, including friction and damping terms."""
    import jax.numpy as jnp
    from mqe_tpu.physics import contact as C

    key = jax.random.PRNGKey(3)
    kp, kv = jax.random.split(key)
    pos = jax.random.uniform(kp, (256, 3), minval=-1, maxval=1) * jnp.array([5.0, 5.0, 0.2])
    vel = jax.random.normal(kv, (256, 3))
    r = jnp.full((256,), 0.03)
    H = jnp.full((64, 64), 0.17)
    origin = jnp.array([-10.0, -10.0])
    scale = jnp.asarray(0.5)
    p = C.DEFAULT_PARAMS
    f_hf = C.sphere_heightfield(pos, vel, r, H, origin, scale, p, 1.0)
    f_pl = C.sphere_plane(pos, vel, r, 0.17, p, 1.0)
    # f32 bilinear arithmetic rounds at ~1e-7 relative on ~500 N forces
    assert float(jnp.abs(f_hf - f_pl).max()) < 1e-3


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
