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


def _check(ref, out, tols=(1e-6, 1e-6, 1e-5, 1e-5, 1e-6, 1e-4)):
    names = ["pos", "quat", "lin_vel", "ang_vel", "q", "qd"]
    for n, a, b, tol in zip(names, ref, out, tols):
        assert a.shape == b.shape, n
        if a.size == 0:
            continue
        diff = float(jnp.abs(a - b).max())
        assert diff <= tol, f"{n}: max diff {diff} > {tol}"


@pytest.mark.slow
def test_pallas_step_extra_wrench_matches_soa():
    """The extra_wrench (NPC two-way-coupling) channel packing: untested in
    round 4, flagged by ADVICE — a packing bug here would corrupt only TPU
    NPC physics while every CPU golden (XLA path) stayed green."""
    m = go1_model()
    B = 37
    pos, quat, lv, av, q, qd, tau, sf, sx, payload, cshift = _rand_state(m, B, seed=3)
    rng = np.random.RandomState(7)
    wrench = jnp.asarray(rng.randn(B, m.nb, 6) * 3.0, dtype=jnp.float32)
    ref = soa.step_actor(
        m, pos, quat, lv, av, q, qd, tau, sf, sx, extra_wrench=wrench,
    )
    out = step_actor_pallas(
        m, pos, quat, lv, av, q, qd, tau, sf, sx, extra_wrench=wrench,
        interpret=True,
    )
    _check(ref, out)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,root_free",
    [("ball", True), ("seesaw", False)],
    ids=["ball-nq0-free", "seesaw-nq1-fixedbase"],
)
def test_pallas_step_npc_models_match_soa(name, root_free):
    """nq=0 (ball) and fixed-base articulated (seesaw) NPC models through
    the fused kernel — the exact configurations scene.substep_batch feeds it
    for NPC dynamics (scene.py npc path)."""
    from mqe_tpu.physics.model import load_model

    m = load_model(name, root_free=True)  # scene loads NPCs root-free
    B = 13
    rng = np.random.RandomState(11)
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    pos = f32(rng.randn(B, 3) * 0.1 + np.array([0, 0, 1.0]))
    qt = rng.randn(B, 4) * 0.05 + np.array([0, 0, 0, 1.0])
    quat = f32(qt / np.linalg.norm(qt, axis=1, keepdims=True))
    lv = f32(rng.randn(B, 3) * 0.3)
    av = f32(rng.randn(B, 3) * 0.3)
    q = f32(rng.randn(B, m.nq) * 0.1)
    qd = f32(rng.randn(B, m.nq) * 0.3)
    tau = jnp.zeros((B, m.nq), dtype=jnp.float32)
    ns = len(m.sph_tags)
    sx, _ = soa.fk_spheres(m, pos, quat, lv, av, q, qd)
    sf = f32(rng.randn(B, ns, 3) * 2.0)
    wrench = f32(rng.randn(B, m.nb, 6) * 1.5)
    ref = soa.step_actor(
        m, pos, quat, lv, av, q, qd, tau, sf, sx,
        extra_wrench=wrench, root_free=root_free,
    )
    out = step_actor_pallas(
        m, pos, quat, lv, av, q, qd, tau, sf, sx,
        extra_wrench=wrench, root_free=root_free, interpret=True,
    )
    _check(ref, out)
