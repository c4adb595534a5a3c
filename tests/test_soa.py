"""SoA (structure-of-arrays) dynamics vs the reference AoS formulation.

soa.py must reproduce dynamics.py/integrator.py bit-for-bit up to float
reassociation: FK sphere placement, and a full contact->ABA->integrate step,
on random states of the go1 (12-dof floating base) and on a hinged NPC.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqe_tpu.physics import dynamics, integrator, soa
from mqe_tpu.physics import scene as S
from mqe_tpu.physics.model import go1_model, load_model


@pytest.fixture(scope="module")
def model():
    return go1_model()


def _rand_state(key, B, model):
    ks = jax.random.split(key, 7)
    pos = jax.random.uniform(ks[0], (B, 3), minval=-1, maxval=1).at[:, 2].add(1.4)
    quat = jax.random.normal(ks[1], (B, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    lv = jax.random.uniform(ks[2], (B, 3), minval=-2, maxval=2)
    av = jax.random.uniform(ks[3], (B, 3), minval=-3, maxval=3)
    mid = (model.q_lower + model.q_upper) / 2
    rng = model.q_upper - model.q_lower
    q = jnp.asarray(mid) + jax.random.uniform(
        ks[4], (B, model.nq), minval=-0.4, maxval=0.4
    ) * jnp.asarray(rng)
    qd = jax.random.uniform(ks[5], (B, model.nq), minval=-5, maxval=5)
    tau = jax.random.uniform(ks[6], (B, model.nq), minval=-15, maxval=15)
    return pos, quat, lv, av, q, qd, tau


def test_fk_spheres_matches(model):
    B = 16
    pos, quat, lv, av, q, qd, _ = _rand_state(jax.random.PRNGKey(0), B, model)

    def ref_one(pos, quat, q, lv, av, qd):
        Rw, pw, X_up, Ssub, _, _ = dynamics.kinematics(model, pos, quat, q)
        _, vw = dynamics.body_velocities(model, Rw, X_up, Ssub, lv, av, qd)
        return S._sphere_world(model, Rw, pw, vw)

    x_ref, v_ref = jax.vmap(ref_one)(pos, quat, q, lv, av, qd)
    x_soa, v_soa = soa.fk_spheres(model, pos, quat, lv, av, q, qd)
    np.testing.assert_allclose(np.asarray(x_soa), np.asarray(x_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_soa), np.asarray(v_ref), atol=1e-4)


def test_step_actor_matches_go1(model):
    B = 16
    dt = 0.0025
    pos, quat, lv, av, q, qd, tau = _rand_state(jax.random.PRNGKey(1), B, model)
    ns = len(model.sph_tags)
    kf = jax.random.PRNGKey(2)
    payload = jax.random.uniform(jax.random.split(kf)[0], (B,), minval=-1, maxval=2)
    com_shift = jax.random.uniform(jax.random.split(kf)[1], (B, 3), minval=-0.05, maxval=0.05)

    # sphere positions from FK, random contact forces on them
    sph_x, _ = soa.fk_spheres(model, pos, quat, lv, av, q, qd)
    force = jax.random.normal(jax.random.PRNGKey(3), (B, ns, 3)) * 20.0

    def ref_one(pos, quat, lv, av, q, qd, tau, f_sph, x_sph, payload, com_shift):
        Rw, pw, _, _, _, _ = dynamics.kinematics(model, pos, quat, q)
        Ispat = S._spatial_inertias(model, payload, com_shift, dtype=pos.dtype)
        wrench = S._accumulate_wrench(model, pw, x_sph, f_sph)
        wrench = wrench + S._gravity_wrench(model, Rw, payload, com_shift)
        wd, ad, qdd, _ = dynamics.forward_dynamics(
            model, Ispat, pos, quat, lv, av, q, qd, tau, wrench
        )
        return integrator.integrate(model, pos, quat, lv, av, q, qd, wd, ad, qdd, dt)

    ref = jax.vmap(ref_one)(pos, quat, lv, av, q, qd, tau, force, sph_x, payload, com_shift)
    got = soa.step_actor(
        model, pos, quat, lv, av, q, qd, tau, force, sph_x,
        payload=payload, com_shift=com_shift, dt=dt,
    )
    names = ["pos", "quat", "lin_vel", "ang_vel", "q", "qd"]
    tols = dict(pos=1e-5, quat=1e-5, lin_vel=1e-3, ang_vel=5e-3, q=1e-4, qd=2e-2)
    for name, r, g in zip(names, ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=tols[name], err_msg=name
        )


def test_step_actor_matches_hinged_npc():
    """1-dof hinged NPC (seesaw-style): fixed root handled like npc_dyn_one."""
    try:
        npc = load_model("seesaw", root_free=True)
    except FileNotFoundError:
        pytest.skip("no seesaw asset")
    B = 8
    dt = 0.0025
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 6)
    pos = jax.random.uniform(ks[0], (B, 3), minval=-1, maxval=1).at[:, 2].add(1.0)
    quat = jax.random.normal(ks[1], (B, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    lv = jax.random.uniform(ks[2], (B, 3), minval=-1, maxval=1)
    av = jax.random.uniform(ks[3], (B, 3), minval=-1, maxval=1)
    q = jax.random.uniform(ks[4], (B, npc.nq), minval=-0.3, maxval=0.3)
    qd = jax.random.uniform(ks[5], (B, npc.nq), minval=-2, maxval=2)
    tau = jnp.zeros((B, npc.nq))
    ns = len(npc.sph_tags)
    sph_x, _ = soa.fk_spheres(npc, pos, quat, lv, av, q, qd)
    force = jax.random.normal(jax.random.PRNGKey(5), (B, max(ns, 1), 3)) * 10.0
    if ns == 0:
        force = jnp.zeros((B, 0, 3))
    wrench_prim = jax.random.normal(jax.random.PRNGKey(6), (B, npc.nb, 6)) * 5.0

    def ref_one(pos, quat, lv, av, q, qd, f_sph, x_sph, wrench_prim, tau_n):
        Rw, pw, _, _, _, _ = dynamics.kinematics(npc, pos, quat, q)
        Ispat = jnp.asarray(npc.spatial_inertia, dtype=pos.dtype)
        wrench = S._accumulate_wrench(npc, pw, x_sph, f_sph)
        wrench = wrench + wrench_prim + S._gravity_wrench(npc, Rw)
        wd, ad, qdd, _ = dynamics.forward_dynamics(
            npc, Ispat, pos, quat, lv, av, q, qd, tau_n, wrench
        )
        wd = jnp.zeros_like(wd)   # npc_root_free=False branch
        ad = jnp.zeros_like(ad)
        return integrator.integrate(npc, pos, quat, lv, av, q, qd, wd, ad, qdd, dt)

    ref = jax.vmap(ref_one)(pos, quat, lv, av, q, qd, force, sph_x, wrench_prim, tau)
    got = soa.step_actor(
        npc, pos, quat, lv, av, q, qd, tau, force, sph_x,
        extra_wrench=wrench_prim, dt=dt, root_free=False,
    )
    for name, r, g in zip(["pos", "quat", "lv", "av", "q", "qd"], ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-3, err_msg=name
        )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
