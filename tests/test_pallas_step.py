"""Equivalence: fused Pallas substep kernel vs the XLA SoA path.

step_actor_pallas shares soa.step_entries with soa.step_actor, so any
disagreement beyond f32 reassociation noise means the channel packing /
tiling plumbing is wrong. Runs in Pallas interpret mode on the CPU mesh
(slow: the unrolled 13-body chain takes ~1-2 min to trace+interpret).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mqe_tpu.physics import soa
from mqe_tpu.physics.model import go1_model
from mqe_tpu.physics.pallas_step import step_actor_pallas


def _rand_state(m, B, seed=0):
    rng = np.random.RandomState(seed)
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    pos = f32(rng.randn(B, 3) * 0.1 + np.array([0, 0, 0.35]))
    qt = rng.randn(B, 4) * 0.05 + np.array([0, 0, 0, 1.0])
    quat = f32(qt / np.linalg.norm(qt, axis=1, keepdims=True))
    lv = f32(rng.randn(B, 3) * 0.3)
    av = f32(rng.randn(B, 3) * 0.3)
    q = f32(rng.randn(B, m.nq) * 0.2)
    qd = f32(rng.randn(B, m.nq) * 0.5)
    tau = f32(rng.randn(B, m.nq) * 2.0)
    ns = len(m.sph_tags)
    sx, _ = soa.fk_spheres(m, pos, quat, lv, av, q, qd)
    sf = f32(rng.randn(B, ns, 3) * 5.0)
    payload = f32(rng.rand(B) * 2)
    cshift = f32(rng.randn(B, 3) * 0.01)
    return pos, quat, lv, av, q, qd, tau, sf, sx, payload, cshift


@pytest.mark.slow
def test_pallas_step_matches_soa():
    m = go1_model()
    B = 100  # deliberately NOT a multiple of the 1024-lane tile: tests padding
    pos, quat, lv, av, q, qd, tau, sf, sx, payload, cshift = _rand_state(m, B)
    ref = soa.step_actor(
        m, pos, quat, lv, av, q, qd, tau, sf, sx,
        payload=payload, com_shift=cshift,
    )
    out = step_actor_pallas(
        m, pos, quat, lv, av, q, qd, tau, sf, sx,
        payload=payload, com_shift=cshift, interpret=True,
    )
    names = ["pos", "quat", "lin_vel", "ang_vel", "q", "qd"]
    tols = [1e-6, 1e-6, 1e-5, 1e-5, 1e-6, 1e-4]
    for n, a, b, tol in zip(names, ref, out, tols):
        assert a.shape == b.shape, n
        diff = float(jnp.abs(a - b).max())
        assert diff <= tol, f"{n}: max diff {diff} > {tol}"
