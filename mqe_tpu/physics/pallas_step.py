"""Fused Pallas TPU kernel for the SoA dynamics substep (FK+ABA+integrate).

The SoA formulation (physics/soa.py) was designed so its entry-level math
could be lifted into a Pallas kernel body unchanged (soa.py module doc): every
physical scalar is an elementwise "entry", and here each entry is one
(tile_s, 128) VMEM block with the robot batch riding the lane axis. The whole
dynamics+integration chain for a batch tile then runs as ONE kernel: state is
read from HBM once and written once, instead of round-tripping HBM between
the several XLA fusions the unrolled 13-body chain otherwise splits into.

This is the experiment named by BASELINE.json's north star ("Pallas kernels
for the rollout inner loop"): `step_actor_pallas` is a drop-in replacement
for `soa.step_actor` on a flat (B, k) batch. A/B-benchmarked on the real chip
by tools/bench_pallas_step.py; equivalence pinned by tests/test_pallas_step.py
(CPU interpret mode). Decision recorded in BENCHLOG.md either way, like the
round-2 contact-kernel A/B.

Reference fidelity: same math as scene.substep's dyn_one (penalty contact +
Featherstone ABA, ref PhysX articulation solver config
mqe/envs/base/legged_robot_config.py:211-229) because it calls the SAME
`soa.step_entries` core — the two paths cannot diverge except by f32
reassociation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mqe_tpu.physics import soa
from mqe_tpu.physics.model import BodyModel

LANE = 128


def _channel_count(model: BodyModel, has_pay, has_cs, has_extra):
    nq, ns, nb = model.nq, len(model.sph_tags), model.nb
    c = 3 + 4 + 3 + 3 + 3 * nq + 2 * (ns * 3)
    if has_pay:
        c += 1
    if has_cs:
        c += 3
    if has_extra:
        c += nb * 6
    return c


def _kernel(x_ref, y_ref, *, model, nq, ns, nb, has_pay, has_cs, has_extra,
            dt, root_free):
    idx = 0

    def take(n):
        nonlocal idx
        out = tuple(x_ref[idx + i] for i in range(n))
        idx += n
        return out

    p3 = take(3)
    q4 = take(4)
    lv = take(3)
    av = take(3)
    ql = take(nq)
    qdl = take(nq)
    taul = take(nq)
    sph_xs = [take(3) for _ in range(ns)]
    sph_fs = [take(3) for _ in range(ns)]
    pay = take(1)[0] if has_pay else None
    cs = take(3) if has_cs else None
    extra = [(take(3), take(3)) for _ in range(nb)] if has_extra else None

    outs = soa.step_entries(
        model, p3, q4, lv, av, ql, qdl, taul, sph_xs, sph_fs,
        pay=pay, cs=cs, extra=extra, dt=dt, root_free=root_free,
    )
    j = 0
    for grp in outs:
        for e in grp:
            y_ref[j] = e
            j += 1


def step_actor_pallas(
    model: BodyModel,
    pos, quat, lin_vel, ang_vel, q, qd,       # (B, k) flat-batch state
    tau,                                      # (B, nq)
    sph_force, sph_x,                         # (B, ns, 3) world
    payload=None, com_shift=None,             # (B,), (B, 3) trunk DR
    extra_wrench=None,                        # (B, nb, 6) world (NPC coupling)
    dt=0.0025,
    root_free=None,
    tile_s: int = 8,
    interpret: bool = False,
):
    """Drop-in for soa.step_actor on a FLAT (B, ...) batch, fused in Pallas.

    Channel-packs all inputs into one (C, S, 128) array (S = padded_B/128),
    tiles S into (tile_s, 128) VMEM blocks over a 1-D parallel grid, and runs
    soa.step_entries once per tile. Returns the six new state arrays (B, k).
    """
    B = pos.shape[0]
    nq, ns, nb = model.nq, len(model.sph_tags), model.nb
    has_pay = payload is not None
    has_cs = com_shift is not None
    has_extra = extra_wrench is not None
    if root_free is None:
        root_free = model.root_free

    blk = tile_s * LANE
    Bp = -(-B // blk) * blk  # pad so the grid tiles the batch exactly

    chans = [
        pos.T, quat.T, lin_vel.T, ang_vel.T,
        q.T, qd.T, tau.T,
        sph_x.reshape(B, ns * 3).T, sph_force.reshape(B, ns * 3).T,
    ]
    if has_pay:
        chans.append(payload[None, :])
    if has_cs:
        chans.append(com_shift.T)
    if has_extra:
        chans.append(extra_wrench.reshape(B, nb * 6).T)
    X = jnp.concatenate(chans, axis=0).astype(jnp.float32)
    C = X.shape[0]
    assert C == _channel_count(model, has_pay, has_cs, has_extra)
    if Bp != B:
        # pad with a valid state (repeat of row 0) so the kernel math stays
        # finite on the pad lanes; the pad results are sliced off
        X = jnp.concatenate([X, jnp.broadcast_to(X[:, :1], (C, Bp - B))], axis=1)
    S = Bp // LANE
    X = X.reshape(C, S, LANE)

    c_out = 3 + 4 + 3 + 3 + 2 * nq
    kern = functools.partial(
        _kernel, model=model, nq=nq, ns=ns, nb=nb,
        has_pay=has_pay, has_cs=has_cs, has_extra=has_extra,
        dt=dt, root_free=root_free,
    )
    Y = pl.pallas_call(
        kern,
        grid=(S // tile_s,),
        in_specs=[
            pl.BlockSpec((C, tile_s, LANE), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((c_out, tile_s, LANE), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c_out, S, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(X)

    Y = Y.reshape(c_out, Bp)[:, :B]

    def grab(n, off):
        return Y[off:off + n].T  # (B, n)

    off = 0
    out = []
    for n in (3, 4, 3, 3):
        out.append(grab(n, off))
        off += n
    if nq:
        out.append(grab(nq, off)); off += nq
        out.append(grab(nq, off)); off += nq
    else:
        empty = jnp.zeros((B, 0), dtype=pos.dtype)
        out += [empty, empty]
    return tuple(out)
