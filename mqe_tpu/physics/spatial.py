"""6D spatial-vector algebra (Featherstone convention) in JAX.

Motion vectors m = (angular, linear); force vectors F = (torque, force), both
expressed at a frame origin. Replaces the closed-source PhysX articulation
solver of the reference (ref mqe/envs/base/legged_robot_config.py:218-229) with
an explicit, jit/vmap-friendly formulation.

Frame transform (R, p): pose of CHILD frame in PARENT frame, x_p = R x_c + p.
"""
from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


def motion_transform(R, p):
    """6x6 X with v_child = X @ v_parent, for child pose (R, p) in parent."""
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, jnp.zeros_like(Rt)], axis=-1)
    bot = jnp.concatenate([-Rt @ skew(p), Rt], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def motion_transform_inv(R, p):
    """6x6 X^-1 with v_parent = X^-1 @ v_child."""
    top = jnp.concatenate([R, jnp.zeros_like(R)], axis=-1)
    bot = jnp.concatenate([skew(p) @ R, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def cross_motion(v, m):
    """Spatial motion cross product v x m."""
    w, vl = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vl, mw)], axis=-1
    )


def cross_force(v, F):
    """Spatial force cross product v x* F."""
    w, vl = v[..., :3], v[..., 3:]
    n, f = F[..., :3], F[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vl, f), jnp.cross(w, f)], axis=-1
    )


def solve_spd6(A, b):
    """Solve A x = b for SPD 6x6 A via fully unrolled Cholesky.

    jnp.linalg.solve's batched LU scalarizes on TPU; this is pure elementwise
    ops that vectorize over any batch dims. A: (..., 6, 6), b: (..., 6).
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def spatial_inertia(mass, com, inertia_com):
    """6x6 spatial inertia at the body-frame origin.

    I = [[I_com + m c^ c^T, m c^], [m c^T, m E]], acting on (w, v) -> (n, f).
    """
    C = skew(com)
    mass = jnp.asarray(mass)
    I_O = inertia_com + mass[..., None, None] * (C @ jnp.swapaxes(C, -1, -2))
    mC = mass[..., None, None] * C
    E = mass[..., None, None] * jnp.broadcast_to(jnp.eye(3), C.shape)
    top = jnp.concatenate([I_O, mC], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(mC, -1, -2), E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
