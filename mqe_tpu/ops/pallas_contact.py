"""Pallas TPU kernel: fused sphere-vs-wall-boxes contact force.

The hottest contact path (SURVEY.md §7 risk #5): every collision sphere tests
against the env's wall boxes each physics iteration. The XLA formulation
materializes an (E, S, B, 3) force tensor in HBM before reducing over B —
at 4096 envs x 80 spheres x 16 boxes x 8 iterations that's the dominant HBM
traffic of the whole step. This kernel keeps the whole B-loop in VMEM and
writes only the reduced (E, S, 3) result.

Layout: SoA with the sphere axis on the 128-lane dimension. Grid over env
tiles; each program processes TILE_E envs x S_pad spheres x B boxes with the
box loop unrolled (B static, <= 16). Everything is VPU elementwise math.

Falls back to interpret mode off-TPU (tests run it on CPU bit-for-bit against
the XLA reference implementation in physics/contact.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_E = 8
LANES = 128


def _kernel(
    pos_ref,      # (TILE_E, 3, S) f32
    vel_ref,      # (TILE_E, 3, S)
    rad_ref,      # (TILE_E, 1, S)
    boxes_ref,    # (TILE_E, B, 8) f32: center(3) half(3) valid pad
    musc_ref,     # (TILE_E, 1, 1) per-env friction multiplier
    out_ref,      # (TILE_E, 3, S)
    *,
    n_boxes: int,
    kn: float,
    hc: float,
    mu: float,
    v_slip: float,
    f_max: float,
):
    px = pos_ref[:, 0, :]
    py = pos_ref[:, 1, :]
    pz = pos_ref[:, 2, :]
    vx = vel_ref[:, 0, :]
    vy = vel_ref[:, 1, :]
    vz = vel_ref[:, 2, :]
    rad = rad_ref[:, 0, :]
    musc = musc_ref[:, 0, :]  # (TILE_E, 1) broadcasts over lanes

    fx = jnp.zeros_like(px)
    fy = jnp.zeros_like(px)
    fz = jnp.zeros_like(px)

    for b in range(n_boxes):
        cx = boxes_ref[:, b, 0][:, None]
        cy = boxes_ref[:, b, 1][:, None]
        cz = boxes_ref[:, b, 2][:, None]
        hx = boxes_ref[:, b, 3][:, None]
        hy = boxes_ref[:, b, 4][:, None]
        hz = boxes_ref[:, b, 5][:, None]
        valid = boxes_ref[:, b, 6][:, None]

        rx = px - cx
        ry = py - cy
        rz = pz - cz
        dx = rx - jnp.clip(rx, -hx, hx)
        dy = ry - jnp.clip(ry, -hy, hy)
        dz = rz - jnp.clip(rz, -hz, hz)
        dist2 = dx * dx + dy * dy + dz * dz
        dist = jnp.sqrt(dist2)
        outside = dist > 1e-9
        inv_dist = 1.0 / (dist + 1e-9)
        nox = dx * inv_dist
        noy = dy * inv_dist
        noz = dz * inv_dist
        depth_out = rad - dist

        gx = hx - jnp.abs(rx)
        gy = hy - jnp.abs(ry)
        gz = hz - jnp.abs(rz)
        gmin = jnp.minimum(gx, jnp.minimum(gy, gz))
        mx = (gx <= gmin).astype(px.dtype)
        my = (gy <= gmin).astype(px.dtype)
        mz = (gz <= gmin).astype(px.dtype)
        msum = mx + my + mz
        sgnx = jnp.where(rx >= 0, 1.0, -1.0)
        sgny = jnp.where(ry >= 0, 1.0, -1.0)
        sgnz = jnp.where(rz >= 0, 1.0, -1.0)
        nix = mx * sgnx / msum
        niy = my * sgny / msum
        niz = mz * sgnz / msum
        depth_in = gmin + rad

        nx = jnp.where(outside, nox, nix)
        ny = jnp.where(outside, noy, niy)
        nz = jnp.where(outside, noz, niz)
        depth = jnp.where(outside, depth_out, depth_in)

        vn = vx * nx + vy * ny + vz * nz
        fn = jnp.clip(kn * depth * (1.0 - hc * vn), 0.0, f_max)
        fn = jnp.where(depth > 0.0, fn, 0.0) * valid

        vtx = vx - vn * nx
        vty = vy - vn * ny
        vtz = vz - vn * nz
        vt = jnp.sqrt(vtx * vtx + vty * vty + vtz * vtz)
        ft = mu * musc * fn * jnp.minimum(1.0, vt / v_slip)
        inv_vt = 1.0 / (vt + 1e-8)

        fx += fn * nx - ft * vtx * inv_vt
        fy += fn * ny - ft * vty * inv_vt
        fz += fn * nz - ft * vtz * inv_vt

    out_ref[:, 0, :] = fx
    out_ref[:, 1, :] = fy
    out_ref[:, 2, :] = fz


def sphere_boxes_pallas(pos, vel, radius, boxes, mu_scale, params, interpret=False):
    """Fused sphere-vs-boxes contact for a BATCH of envs.

    pos/vel: (E, S, 3); radius: (S,); boxes: (E, B, 7); mu_scale: (E,).
    Returns (E, S, 3) summed forces. S is padded to 128 lanes internally.
    """
    E, S, _ = pos.shape
    B = boxes.shape[1]
    S_pad = ((S + LANES - 1) // LANES) * LANES
    E_pad = ((E + TILE_E - 1) // TILE_E) * TILE_E

    # SoA layout (E, 3, S_pad)
    def pad_soa(x):
        x = jnp.swapaxes(x, 1, 2)  # (E, 3, S)
        x = jnp.pad(x, ((0, E_pad - E), (0, 0), (0, S_pad - S)))
        return x

    pos_s = pad_soa(pos)
    vel_s = pad_soa(vel)
    rad = jnp.broadcast_to(radius[None, None, :], (E, 1, S))
    rad = jnp.pad(rad, ((0, E_pad - E), (0, 0), (0, S_pad - S)))
    boxes8 = jnp.pad(boxes, ((0, E_pad - E), (0, 0), (0, 1)))
    musc = jnp.broadcast_to(mu_scale[:, None, None], (E, 1, 1))
    musc = jnp.pad(musc, ((0, E_pad - E), (0, 0), (0, 0)))

    kernel = functools.partial(
        _kernel,
        n_boxes=B,
        kn=params.kn,
        hc=params.hc_damping,
        mu=params.mu,
        v_slip=params.v_slip,
        f_max=params.f_max,
    )
    grid = (E_pad // TILE_E,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((E_pad, 3, S_pad), pos.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_E, 3, S_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_E, 3, S_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_E, 1, S_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_E, B, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_E, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE_E, 3, S_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(pos_s, vel_s, rad, boxes8, musc)
    return jnp.swapaxes(out[:E, :, :S], 1, 2)
