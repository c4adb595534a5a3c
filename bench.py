"""Benchmark: aggregate env-steps/s of the flagship go1gate task on real HW.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...diag}.

Baseline context: the reference publishes no throughput numbers
(BASELINE.md); its canonical training scale is 500 envs on one GPU. We
measure control-steps/s * num_envs (agent-steps would be 2x). vs_baseline
compares against a 25k env-steps/s ESTIMATE of what a single-GPU Isaac Gym
setup typically sustains at 500 envs on this task class — our own estimate,
NOT a published reference number (the reference publishes none; BASELINE.md).
Default scale is the north-star 4096 envs on accelerators (512 was round 1's
scale; see BENCHLOG.md for the full matrix).

Robustness (added round 5 after the r4 driver-vs-builder 24x discrepancy,
VERDICT r4 #1): on accelerators the harness times BOTH dynamics paths
(XLA-fused vs fused Pallas substep kernel) during warmup and reports the
faster one, so a runtime where the Pallas kernel misbehaves falls back to
XLA automatically. The headline value is the best of 3 timed chunks
(transient host/tunnel contention can only slow a chunk down, never speed
it up). Extra JSON fields make any future discrepancy diagnosable from the
artifact alone:
  path          — "pallas" or "xla", whichever won the warmup A/B
  ab            — steps/s of each candidate path during the A/B
  compile_s     — per-path compile (first-call) seconds
  chunks        — steps/s of each timed chunk of the winner
  canary_tflops — achieved bf16 4096^3 matmul TFLOP/s (reps fused into one
                  scanned program) measured just after the bench; an
                  uncontended v5-lite chip sustains ~74 on this canary; a
                  value far below that means the chip/tunnel was contended
                  and the bench number underestimates the framework
  contended     — true when the canary lands below 25 TFLOP/s on a TPU
"""
import argparse
import dataclasses
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="go1gate")
    p.add_argument("--num-envs", type=int, default=None)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--no-ab", action="store_true", help="skip the XLA/Pallas A/B")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mqe_tpu.envs import make_mqe_env

    backend = jax.default_backend()
    # pick an env count that saturates the device
    num_envs = args.num_envs or (4096 if backend != "cpu" else 16)

    # contention canary: achieved bf16 matmul throughput right now. The
    # reps are fused into ONE device program (scan) so per-dispatch tunnel
    # latency (~ms on remote-attached chips) doesn't drown the measurement.
    def canary_tflops():
        n, reps = 4096, 20
        a = jnp.full((n, n), 1.0 / n, jnp.bfloat16)

        @jax.jit
        def f(c):
            return jax.lax.scan(lambda c, _: (c @ a, None), c, None, length=reps)[0]

        c0 = jnp.ones((n, n), jnp.bfloat16)
        f(c0).block_until_ready()
        t0 = time.perf_counter()
        f(c0).block_until_ready()
        return reps * 2 * n**3 / (time.perf_counter() - t0) / 1e12

    wrap, _ = make_mqe_env(args.task, num_envs=num_envs, seed=0)
    key = jax.random.PRNGKey(0)
    ts, _ = wrap.reset(key)
    A = getattr(wrap, "controlled_agents", wrap.num_agents)
    actions = jnp.zeros((num_envs, A, 3)).at[..., 0].set(0.5)

    def make_chunk():
        @jax.jit
        def chunk(ts, key):
            def body(carry, _):
                ts, key = carry
                key, k = jax.random.split(key)
                ts, obs, rew, done, info = wrap._step_impl(ts, actions, k)
                return (ts, key), rew.mean()

            (ts, key), r = jax.lax.scan(body, (ts, key), None, length=args.steps)
            return ts, key, r.mean()

        return chunk

    chunk_envsteps = args.steps * num_envs
    scene0 = wrap.env.scene
    if backend == "cpu" or args.no_ab:
        candidates = [(None, scene0)]
    else:
        candidates = [
            ("xla", dataclasses.replace(scene0, use_pallas=False)),
            ("pallas", dataclasses.replace(scene0, use_pallas=True)),
        ]

    ab, compile_s = {}, {}
    best = None
    for name, scene in candidates:
        wrap.env.scene = scene
        fn = make_chunk()
        t0 = time.perf_counter()
        ts2, key2, _ = fn(ts, key)
        jax.block_until_ready(ts2)
        compile_s[name or "default"] = round(time.perf_counter() - t0, 1)
        # one timed chunk = the A/B measurement
        t0 = time.perf_counter()
        ts2, key2, _ = fn(ts2, key2)
        jax.block_until_ready(ts2)
        sps = chunk_envsteps / (time.perf_counter() - t0)
        ab[name or "default"] = round(sps, 1)
        if best is None or sps > best[1]:
            best = (name, sps, fn, ts2, key2)

    name, _, fn, ts, key = best
    chunks = []
    for _ in range(3):
        t0 = time.perf_counter()
        ts, key, r = fn(ts, key)
        jax.block_until_ready(ts)
        chunks.append(round(chunk_envsteps / (time.perf_counter() - t0), 1))

    steps_per_s = max(chunks + [best[1]])
    tflops = canary_tflops() if backend != "cpu" else 0.0
    baseline = 25000.0  # est. single-GPU Isaac Gym env-steps/s at 500 envs
    print(
        json.dumps(
            {
                "metric": f"{args.task}_env_steps_per_s_{backend}_{num_envs}envs",
                "value": round(steps_per_s, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(steps_per_s / baseline, 3),
                # vs_baseline denominator is OUR estimate, not a published
                # reference number (the reference publishes none):
                "baseline_def": "est_isaac_gym_single_gpu_25k_env_steps_per_s",
                "path": name or "default",
                "ab": ab,
                "compile_s": compile_s,
                "chunks": chunks,
                "timing": "best_chunk",
                "canary_tflops": round(tflops, 1),
                # uncontended v5-lite measures ~74 TFLOP/s on this canary;
                # <25 means the chip/tunnel is being shared and `value`
                # underestimates the framework
                "contended": bool(backend != "cpu" and tflops < 25.0),
            }
        )
    )


if __name__ == "__main__":
    main()
