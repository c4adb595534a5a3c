"""Onboard forward camera: analytic raycaster units + env integration.

Reference spec: a 16x16 forward depth/RGB camera attached to the trunk at
(0.26, 0, 0.03) (ref mqe/envs/field/legged_robot_field.py:23-93,
legged_robot_field_config.py:72-77). Here rendered by analytic ray tests
against the physics primitives (mqe_tpu/render/onboard.py).
"""
import jax
import jax.numpy as jnp
import numpy as np

from mqe_tpu.render import onboard


def test_camera_rays_geometry():
    rays = onboard.camera_rays((16, 16), 90.0)
    assert rays.shape == (16, 16, 3)
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-6)
    # center-ish pixels look mostly forward (+x)
    assert rays[8, 8, 0] > 0.95
    # left column has +y (left-positive), top row has +z
    assert rays[8, 0, 1] > 0.3
    assert rays[0, 8, 2] > 0.3


def test_ray_plane_depth():
    # camera 1 m above the ground looking 45 deg down: depth = sqrt(2)
    o = jnp.array([0.0, 0.0, 1.0])
    d = jnp.array([[1.0, 0.0, -1.0]]) / np.sqrt(2.0)
    depth, _ = onboard.render(
        o, d, jnp.zeros((1, 7)), jnp.zeros((0, 5)), far=10.0, flat_height=0.0
    )
    np.testing.assert_allclose(float(depth[0]), np.sqrt(2.0), atol=1e-5)


def test_ray_box_hit_and_normal_shading():
    # unit box centered at x=3, ray straight ahead -> depth 2.5 (front face)
    o = jnp.array([0.0, 0.0, 0.5])
    d = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    boxes = jnp.array([[3.0, 0.0, 0.5, 0.5, 0.5, 0.5, 1.0]])
    depth, rgb = onboard.render(
        o, d, boxes, jnp.zeros((0, 5)), far=10.0, flat_height=-1.0, rgb=True
    )
    np.testing.assert_allclose(float(depth[0]), 2.5, atol=1e-5)
    # sideways ray misses the box and the (lowered) ground -> sky at far
    assert float(depth[1]) == 10.0
    np.testing.assert_allclose(np.asarray(rgb[1]), onboard.ALBEDO_SKY, atol=1e-5)
    # box albedo is reddish
    assert float(rgb[0, 0]) > float(rgb[0, 2])


def test_ray_sphere_depth():
    o = jnp.zeros(3)
    d = jnp.array([[1.0, 0.0, 0.0]])
    spheres = jnp.array([[2.0, 0.0, 0.0, 0.5, 1.0]])
    depth, _ = onboard.render(
        o, d, jnp.zeros((1, 7)), spheres, far=10.0, flat_height=-5.0
    )
    np.testing.assert_allclose(float(depth[0]), 1.5, atol=1e-5)
    # invalid sphere is ignored
    depth2, _ = onboard.render(
        o, d, jnp.zeros((1, 7)), spheres.at[0, 4].set(0.0), far=10.0,
        flat_height=-5.0,
    )
    assert float(depth2[0]) == 10.0


def test_ray_heightfield_matches_plane():
    # constant heightfield must agree with the analytic plane path
    o = jnp.array([1.0, 1.0, 0.8])
    d = jnp.asarray(onboard.camera_rays((4, 4), 90.0).reshape(-1, 3))
    hf = jnp.full((64, 64), 0.2)
    kw = dict(far=5.0, hf=hf, hf_origin=jnp.array([-2.0, -2.0]),
              hf_scale=jnp.asarray(0.1))
    depth_hf, _ = onboard.render(o, d, jnp.zeros((1, 7)), jnp.zeros((0, 5)),
                                 flat_height=None, **kw)
    depth_pl, _ = onboard.render(o, d, jnp.zeros((1, 7)), jnp.zeros((0, 5)),
                                 flat_height=0.2, **kw)
    hit = np.asarray(depth_pl) < 5.0
    np.testing.assert_allclose(
        np.asarray(depth_hf)[hit], np.asarray(depth_pl)[hit], atol=0.06
    )


def test_env_depth_camera_integration():
    from mqe_tpu.envs import make_mqe_env
    from mqe_tpu.envs.tasks import Go1GateCfg

    class CamGateCfg(Go1GateCfg):
        class obs(Go1GateCfg.obs):
            class cfgs(Go1GateCfg.obs.cfgs):
                depth_image = True
                rgb_image = True

    wrap, _ = make_mqe_env("go1gate", num_envs=2, seed=0,
                           custom_cfg=lambda _: CamGateCfg)
    ts, obs = wrap.reset(jax.random.PRNGKey(0))
    ob = wrap.env._observations(ts.env)
    E, A = 2, 2
    assert ob.depth_image.shape == (E, A, 16, 16)
    assert ob.rgb_image.shape == (E, A, 16, 16, 3)
    d = np.asarray(ob.depth_image)
    far = wrap.env.cam_far
    assert np.isfinite(d).all() and (d > 0).all() and (d <= far).all()
    # bottom rows look down at the ground -> nearer than the top rows, which
    # mostly see sky (clipped at far)
    assert d[:, :, -1, :].mean() < d[:, :, 0, :].mean()
    assert (d[:, :, 0, :] > 0.9 * far).mean() > 0.5
    rgb = np.asarray(ob.rgb_image)
    assert (rgb >= 0).all() and (rgb <= 1).all()
    # each agent's camera must not see its own impostor sphere (0.3 m) --
    # nothing can be closer than the near geometry ahead of the nose
    assert (d > 0.05).all()
