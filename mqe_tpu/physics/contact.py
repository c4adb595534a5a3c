"""Penalty contact model: spheres vs heightfield / boxes / cylinders / spheres.

TPU-native replacement for PhysX contact generation + TGS solve (SURVEY.md
§2.1): all collision geometry on the robot side is spheres (see
urdf.spherize); the world side is a regular-grid heightfield (pure gather,
ideal for TPU) plus analytic boxes/cylinders for walls and fixtures. Forces
are compliant (spring-damper normal + regularized Coulomb friction), which at
dt=0.005 with 4 substeps matches the reference's soft-contact regime.

All functions are per-contact-point and broadcast over leading dims; no
data-dependent shapes anywhere.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class ContactParams:
    kn: float = 4000.0     # normal stiffness [N/m]
    hc_damping: float = 3.0  # Hunt-Crossley damping ratio [s/m]: fn = kn*d*(1 - hc*vn)
    mu: float = 1.0        # friction coefficient (terrain static_friction=1.0)
    v_slip: float = 0.02   # regularization slip velocity [m/s]
    f_max: float = 500.0   # per-point normal force clamp [N]
    # stable with physics dt <= 0.0025 s (run 2 sub-iterations per reference
    # 0.005 s substep; see envs config sim.subiters)


DEFAULT_PARAMS = ContactParams()


def penalty_force(depth, normal, vel, params: ContactParams, mu_scale=1.0):
    """Contact force at a point.

    depth: (...,) penetration (>0 when in contact)
    normal: (..., 3) unit contact normal (pointing away from the surface)
    vel: (..., 3) velocity of the contact point relative to the surface
    Returns (..., 3) world-frame force on the point's body.
    """
    vn = jnp.sum(vel * normal, axis=-1)
    active = depth > 0.0
    # Hunt-Crossley: damping proportional to penetration, so the force ramps
    # from zero at first touch (no impact spikes on light bodies)
    fn = jnp.clip(params.kn * depth * (1.0 - params.hc_damping * vn), 0.0, params.f_max)
    fn = jnp.where(active, fn, 0.0)
    vt = vel - vn[..., None] * normal
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    ft_mag = params.mu * mu_scale * fn * jnp.minimum(1.0, vt_norm / params.v_slip)
    ft = -ft_mag[..., None] * vt / (vt_norm[..., None] + 1e-8)
    return fn[..., None] * normal + ft


class Heightfield:
    """Static heightfield sampler (pure functions over a (X, Y) array)."""

    @staticmethod
    def sample(height, origin, scale, xy):
        """Bilinear height + gradient at world xy.

        height: (X, Y) meters; origin: (2,) world coords of cell (0,0);
        scale: meters/cell; xy: (..., 2).
        Returns h: (...,), grad: (..., 2).
        """
        u = (xy - origin) / scale
        X, Y = height.shape
        ux = jnp.clip(u[..., 0], 0.0, X - 1.001)
        uy = jnp.clip(u[..., 1], 0.0, Y - 1.001)
        ix = jnp.floor(ux).astype(jnp.int32)
        iy = jnp.floor(uy).astype(jnp.int32)
        fx = ux - ix
        fy = uy - iy
        h00 = height[ix, iy]
        h10 = height[ix + 1, iy]
        h01 = height[ix, iy + 1]
        h11 = height[ix + 1, iy + 1]
        h0 = h00 * (1 - fy) + h01 * fy
        h1 = h10 * (1 - fy) + h11 * fy
        h = h0 * (1 - fx) + h1 * fx
        dhdx = (h1 - h0) / scale
        dhdy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) / scale
        return h, jnp.stack([dhdx, dhdy], axis=-1)


def sphere_heightfield(pos, vel, radius, height, origin, scale, params, mu_scale=1.0):
    """Force on a sphere from the heightfield ground. pos/vel: (..., 3)."""
    h, grad = Heightfield.sample(height, origin, scale, pos[..., :2])
    n = jnp.concatenate([-grad, jnp.ones_like(grad[..., :1])], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    # vertical gap projected on the surface normal
    depth = (h - (pos[..., 2] - radius)) * n[..., 2]
    return penalty_force(depth, n, vel, params, mu_scale)


def sphere_plane(pos, vel, radius, plane_h, params, mu_scale=1.0):
    """Force on a sphere from the horizontal plane z = plane_h.

    Fast path for flat heightfields (every predefined task's ground is flat —
    walls/fixtures are analytic boxes): skips the 4-corner bilinear gather of
    `sphere_heightfield`, which otherwise dominates the substep on TPU
    (gathers scalarize; this is pure lane-parallel VPU math).
    """
    n = jnp.zeros_like(pos).at[..., 2].set(1.0)
    depth = plane_h - (pos[..., 2] - radius)
    return penalty_force(depth, n, vel, params, mu_scale)


def sphere_box(pos, vel, radius, center, half, params, mu_scale=1.0, box_vel=None):
    """Force on a sphere from an axis-aligned box. Broadcasts over leading dims.

    center/half: (..., 3). For rotated boxes transform pos/vel into the box
    frame first and rotate the force back.
    """
    rel = pos - center
    clamped = jnp.clip(rel, -half, half)
    # outside: vector from closest surface point to sphere center
    delta = rel - clamped
    dist = jnp.linalg.norm(delta, axis=-1)
    outside = dist > 1e-9
    n_out = delta / (dist[..., None] + 1e-9)
    depth_out = radius - dist

    # inside: push out along the face with least penetration. Gather-free
    # one-hot (comparisons only) — dynamic-index gathers scalarize on TPU.
    gap = half - jnp.abs(rel)  # (..., 3), >=0 when inside
    min_gap = jnp.min(gap, axis=-1, keepdims=True)
    is_min = (gap <= min_gap).astype(pos.dtype)
    is_min = is_min / jnp.sum(is_min, axis=-1, keepdims=True)
    sign = jnp.where(rel >= 0, 1.0, -1.0)
    n_in = is_min * sign
    depth_in = min_gap[..., 0] + radius

    n = jnp.where(outside[..., None], n_out, n_in)
    depth = jnp.where(outside, depth_out, depth_in)
    rel_vel = vel if box_vel is None else vel - box_vel
    return penalty_force(depth, n, rel_vel, params, mu_scale)


def sphere_sphere(pos_a, vel_a, r_a, pos_b, vel_b, r_b, params, mu_scale=1.0):
    """Force on sphere A from sphere B (equal-opposite applies to B)."""
    delta = pos_a - pos_b
    dist = jnp.linalg.norm(delta, axis=-1)
    n = delta / (dist[..., None] + 1e-9)
    depth = (r_a + r_b) - dist
    return penalty_force(depth, n, vel_a - vel_b, params, mu_scale)


def sphere_vertical_cylinder(
    pos, vel, radius, center, cyl_radius, half_length, params, mu_scale=1.0, cyl_vel=None
):
    """Force on a sphere from a vertical (z-axis) cylinder (e.g. wrestling
    ring platform, tug disc). center: cylinder center."""
    rel = pos - center
    rho = jnp.linalg.norm(rel[..., :2], axis=-1)
    dr = rho - cyl_radius          # >0: radially outside
    dz = jnp.abs(rel[..., 2]) - half_length  # >0: above/below

    radial_dir = rel[..., :2] / (rho[..., None] + 1e-9)
    z_dir = jnp.sign(rel[..., 2])
    z_dir = jnp.where(z_dir == 0, 1.0, z_dir)

    # closest-feature logic
    outside_r = dr > 0
    outside_z = dz > 0
    # side contact normal (radial), cap contact normal (z), edge blend
    n_side = jnp.concatenate([radial_dir, jnp.zeros_like(rho[..., None])], axis=-1)
    n_cap = jnp.concatenate(
        [jnp.zeros_like(rel[..., :2]), z_dir[..., None]], axis=-1
    )
    dist_out = jnp.sqrt(jnp.maximum(dr, 0) ** 2 + jnp.maximum(dz, 0) ** 2)
    n_edge_2d = jnp.stack([jnp.maximum(dr, 0), jnp.maximum(dz, 0)], axis=-1)
    n_edge_2d = n_edge_2d / (jnp.linalg.norm(n_edge_2d, axis=-1, keepdims=True) + 1e-9)
    n_edge = (
        n_side * n_edge_2d[..., 0:1] + n_cap * n_edge_2d[..., 1:2]
    )

    both_out = outside_r & outside_z
    n = jnp.where(
        both_out[..., None],
        n_edge,
        jnp.where(outside_r[..., None], n_side, n_cap),
    )
    # penetration depth
    depth_partial = radius - jnp.where(
        both_out, dist_out, jnp.where(outside_r, dr, dz)
    )
    inside = (~outside_r) & (~outside_z)
    # fully inside: exit along the axis with the smaller penetration
    n_inside = jnp.where((jnp.abs(dr) < jnp.abs(dz))[..., None], n_side, n_cap)
    n = jnp.where(inside[..., None], n_inside, n)
    depth = jnp.where(
        inside, radius + jnp.minimum(jnp.abs(dr), jnp.abs(dz)), depth_partial
    )
    rel_vel = vel if cyl_vel is None else vel - cyl_vel
    return penalty_force(depth, n, rel_vel, params, mu_scale)
