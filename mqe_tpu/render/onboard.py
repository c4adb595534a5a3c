"""Onboard forward camera: batched analytic raycaster (depth + RGB).

TPU-native replacement for the reference's Isaac Gym onboard camera sensors
(ref mqe/envs/field/legged_robot_field.py:23-93, sensor cfg
legged_robot_field_config.py:72-77: 16x16 forward camera at (0.26, 0, 0.03)
on the trunk). Isaac Gym rasterizes the scene on the GPU; here every pixel is
one analytic ray test against the same primitives the physics uses — ground
plane / heightfield, terrain wall boxes, and sphere impostors for the other
actors — which XLA fuses into a single elementwise program. No BVH, no
gather-heavy traversal: (E*A rays x primitives) dense math, ideal for TPU.

RGB is flat-shaded lambertian over per-primitive albedos (the reference's RGB
camera is a full rasterizer; for RL consumption the shaded-primitive image
carries the same task information). Documented deviation, PARITY.md.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# per-primitive albedos for the RGB channel
ALBEDO_GROUND = np.array([0.45, 0.42, 0.38], dtype=np.float32)
ALBEDO_BOX = np.array([0.65, 0.25, 0.2], dtype=np.float32)
ALBEDO_ACTOR = np.array([0.25, 0.55, 0.3], dtype=np.float32)
ALBEDO_SKY = np.array([0.7, 0.8, 0.95], dtype=np.float32)
LIGHT_DIR = np.array([0.3, 0.2, 0.93], dtype=np.float32)  # world, normalized-ish


def camera_rays(resolution, hfov_deg: float) -> np.ndarray:
    """Pixel ray directions in the camera frame (x fwd, y left, z up).

    Returns (H, W, 3) unit vectors. Pinhole model; vertical fov scales with
    aspect like the reference notes (legged_robot_field.py:44).
    """
    H, W = resolution
    half_w = np.tan(np.radians(hfov_deg) / 2.0)
    half_h = half_w * H / W
    # pixel centers; v runs top->bottom (image convention), y left-positive
    u = (np.arange(W) + 0.5) / W * 2.0 - 1.0   # [-1, 1)
    v = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    yy = -u[None, :] * half_w * np.ones((H, 1))
    zz = -v[:, None] * half_h * np.ones((1, W))
    xx = np.ones((H, W))
    d = np.stack([xx, yy, zz], axis=-1)
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def _ray_plane(o, d, height, far):
    """t of ray-vs-horizontal-plane z=height. o,d: (..., 3)."""
    dz = d[..., 2]
    t = (height - o[..., 2]) / jnp.where(jnp.abs(dz) < 1e-6, -1e-6, dz)
    return jnp.where((t > 0) & (dz < 0), t, far)


def _ray_heightfield(o, d, hf, origin, scale, far, n_steps: int = 48):
    """Fixed-step ray march against a bilinear heightfield. o,d: (R, 3).

    Returns (R,) first-crossing t (linear-refined) or far. Used only for
    non-flat terrains (all 13 predefined tasks take the flat fast path).
    """
    ts = jnp.linspace(0.0, far, n_steps)                       # (K,)
    p = o[:, None, :] + d[:, None, :] * ts[None, :, None]       # (R, K, 3)
    gx = (p[..., 0] - origin[0]) / scale
    gy = (p[..., 1] - origin[1]) / scale
    X, Y = hf.shape
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, X - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, Y - 2)
    fx = jnp.clip(gx - x0, 0.0, 1.0)
    fy = jnp.clip(gy - y0, 0.0, 1.0)
    h00 = hf[x0, y0]
    h10 = hf[x0 + 1, y0]
    h01 = hf[x0, y0 + 1]
    h11 = hf[x0 + 1, y0 + 1]
    h = (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
         + h01 * (1 - fx) * fy + h11 * fx * fy)                 # (R, K)
    below = p[..., 2] < h
    # first k with below[k]; linear refine between k-1 and k
    first = jnp.argmax(below, axis=1)                           # 0 if none
    hit = below.any(axis=1)
    k1 = jnp.maximum(first, 1)
    t0 = ts[k1 - 1]
    t1 = ts[k1]
    gap0 = jnp.take_along_axis(p[..., 2] - h, (k1 - 1)[:, None], axis=1)[:, 0]
    gap1 = jnp.take_along_axis(p[..., 2] - h, k1[:, None], axis=1)[:, 0]
    frac = gap0 / jnp.maximum(gap0 - gap1, 1e-6)
    t = t0 + frac * (t1 - t0)
    return jnp.where(hit, t, far)


def _ray_boxes(o, d, boxes, far):
    """Slab test vs axis-aligned boxes. o,d: (R,3); boxes: (B,7).

    Returns (R,) min-hit t and (R, 3) hit normal (axis of entry face).
    """
    c = boxes[:, 0:3]
    h = boxes[:, 3:6]
    valid = boxes[:, 6] > 0
    lo = c - h
    hi = c + h
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-8, 1e-8, d)           # (R, 3)
    t1 = (lo[None] - o[:, None, :]) * inv[:, None, :]           # (R, B, 3)
    t2 = (hi[None] - o[:, None, :]) * inv[:, None, :]
    tmin_ax = jnp.minimum(t1, t2)
    tmax_ax = jnp.maximum(t1, t2)
    tmin = tmin_ax.max(axis=-1)                                 # (R, B)
    tmax = tmax_ax.min(axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin > 0) & valid[None, :]
    t = jnp.where(hit, tmin, far)                               # (R, B)
    tb = t.min(axis=-1)                                         # (R,)
    bi = t.argmin(axis=-1)                                      # (R,)
    # entry-face normal: axis whose tmin_ax equals tmin, signed against d
    ax = jnp.take_along_axis(tmin_ax, bi[:, None, None].repeat(3, -1), axis=1)[:, 0]  # (R,3)
    tsel = jnp.take_along_axis(tmin, bi[:, None], axis=1)       # (R,1)
    is_entry = jnp.abs(ax - tsel) < 1e-5
    normal = jnp.where(is_entry, -jnp.sign(d), 0.0)
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nn, 1e-6)
    return tb, normal


def _ray_spheres(o, d, spheres, far):
    """Quadratic vs spheres. o,d: (R,3); spheres: (M, 5) center/radius/valid.

    Returns (R,) min-hit t and (R, 3) hit normal.
    """
    c = spheres[:, 0:3]
    r = spheres[:, 3]
    valid = spheres[:, 4] > 0
    oc = o[:, None, :] - c[None]                                # (R, M, 3)
    b = (oc * d[:, None, :]).sum(-1)                            # (R, M)
    disc = b * b - ((oc * oc).sum(-1) - (r * r)[None])
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    hit = (disc > 0) & (t > 0) & valid[None]
    t = jnp.where(hit, t, far)
    ts = t.min(axis=-1)
    mi = t.argmin(axis=-1)
    hit_p = o + d * ts[:, None]
    normal = hit_p - c[mi]
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-6)
    return ts, normal


def render(o, d, boxes, spheres, far, flat_height=None, hf=None,
           hf_origin=None, hf_scale=None, rgb: bool = False):
    """Render depth (and optionally RGB) for R rays of ONE camera.

    o: (3,) camera origin; d: (R, 3) world ray dirs; boxes (B, 7);
    spheres (M, 5). Returns depth (R,) in [0, far] and rgb (R, 3) or None.
    """
    R = d.shape[0]
    o_b = jnp.broadcast_to(o, (R, 3))
    if flat_height is not None:
        t_g = _ray_plane(o_b, d, flat_height, far)
    else:
        t_g = _ray_heightfield(o_b, d, hf, hf_origin, hf_scale, far)
    t_b, n_b = _ray_boxes(o_b, d, boxes, far)
    if spheres.shape[0] > 0:
        t_s, n_s = _ray_spheres(o_b, d, spheres, far)
    else:
        t_s = jnp.full((R,), far)
        n_s = jnp.zeros((R, 3))
    depth = jnp.minimum(jnp.minimum(t_g, t_b), t_s)
    if not rgb:
        return depth, None
    up = jnp.array([0.0, 0.0, 1.0])
    which = jnp.argmin(jnp.stack([t_g, t_b, t_s], axis=-1), axis=-1)  # (R,)
    normal = jnp.where(
        (which == 0)[:, None], up,
        jnp.where((which == 1)[:, None], n_b, n_s),
    )
    albedo = jnp.where(
        (which == 0)[:, None], jnp.asarray(ALBEDO_GROUND),
        jnp.where((which == 1)[:, None], jnp.asarray(ALBEDO_BOX), jnp.asarray(ALBEDO_ACTOR)),
    )
    light = jnp.asarray(LIGHT_DIR) / np.linalg.norm(LIGHT_DIR)
    shade = 0.35 + 0.65 * jnp.maximum((normal * light).sum(-1), 0.0)
    color = albedo * shade[:, None]
    sky = depth >= far - 1e-6
    return depth, jnp.where(sky[:, None], jnp.asarray(ALBEDO_SKY), color)
