"""A/B bench: fused Pallas substep kernel vs the XLA SoA path (real chip).

Measures soa.step_actor (XLA fusions) against physics/pallas_step.py's
step_actor_pallas (one fused kernel per batch tile) on the isolated
FK+ABA+integrate hot op at go1-production batch sizes, exactly like the
round-2 contact-kernel A/B (BENCHLOG.md) that retired ops/pallas_contact.py.
Decision goes to BENCHLOG either way.

Usage: python tools/bench_pallas_step.py [--batches 1024 4096 8192]
       [--tiles 8 16 32] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="*", default=[1024, 4096, 8192])
    p.add_argument("--tiles", type=int, nargs="*", default=[8, 16, 32])
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--inner", type=int, default=8,
                   help="substeps chained per timed call (matches the 8 "
                        "physics substeps of one control step)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mqe_tpu.physics import soa
    from mqe_tpu.physics.model import go1_model
    from mqe_tpu.physics.pallas_step import step_actor_pallas

    backend = jax.default_backend()
    m = go1_model()
    ns = len(m.sph_tags)

    def make_state(B):
        rng = np.random.RandomState(0)
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        pos = f32(rng.randn(B, 3) * 0.05 + np.array([0, 0, 0.35]))
        qt = rng.randn(B, 4) * 0.05 + np.array([0, 0, 0, 1.0])
        quat = f32(qt / np.linalg.norm(qt, axis=1, keepdims=True))
        lv = f32(rng.randn(B, 3) * 0.3)
        av = f32(rng.randn(B, 3) * 0.3)
        q = f32(rng.randn(B, m.nq) * 0.2)
        qd = f32(rng.randn(B, m.nq) * 0.5)
        tau = f32(rng.randn(B, m.nq) * 2.0)
        sx, _ = soa.fk_spheres(m, pos, quat, lv, av, q, qd)
        sf = f32(rng.randn(B, ns, 3) * 5.0)
        payload = f32(rng.rand(B) * 2)
        cshift = f32(rng.randn(B, 3) * 0.01)
        return (pos, quat, lv, av, q, qd), (tau, sf, sx, payload, cshift)

    def chain(step_fn, state, consts, n):
        """n dependent substeps (sph forces/x held fixed: isolates dynamics)."""
        tau, sf, sx, payload, cshift = consts

        def body(carry, _):
            pos, quat, lv, av, q, qd = carry
            out = step_fn(
                m, pos, quat, lv, av, q, qd, tau, sf, sx,
                payload=payload, com_shift=cshift,
            )
            return out, None

        out, _ = jax.lax.scan(body, state, None, length=n)
        return out

    for B in args.batches:
        state, consts = make_state(B)

        def time_fn(fn):
            jit_fn = jax.jit(lambda s: chain(fn, s, consts, args.inner))
            t0 = time.time()
            out = jit_fn(state)
            jax.block_until_ready(out)
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.reps):
                out = jit_fn(out)
            jax.block_until_ready(out)
            per_call = (time.time() - t0) / args.reps
            return per_call, compile_s

        xla_t, xla_c = time_fn(soa.step_actor)
        row = {
            "backend": backend, "B": B, "inner": args.inner,
            "xla_ms": round(xla_t * 1e3, 3), "xla_compile_s": round(xla_c, 1),
        }
        for ts_ in args.tiles:
            if B % (ts_ * 128) and B > ts_ * 128:
                continue

            def pfn(*a, **k):
                return step_actor_pallas(*a, tile_s=ts_, **k)

            try:
                pt, pc = time_fn(pfn)
                row[f"pallas_ts{ts_}_ms"] = round(pt * 1e3, 3)
                row[f"pallas_ts{ts_}_compile_s"] = round(pc, 1)
                row[f"speedup_ts{ts_}"] = round(xla_t / pt, 2)
            except Exception as e:  # Mosaic limits are part of the result
                row[f"pallas_ts{ts_}_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
