"""Throughput matrix on real hardware: the BASELINE.json bench configs.

Runs each (task, num_envs) config, measures aggregate env-steps/s (control
steps x num_envs), and emits one JSON line per config plus a markdown table
for BENCHLOG.md. `--soa-ab` additionally re-runs each config with the AoS
(vmap(substep)) dynamics path for an A/B of the SoA lane-layout dynamics
(physics/soa.py) on the same device.

BASELINE.json configs covered:
  go1gate @ 512/2048/4096, go1seesaw @ 1024, go1sheep-hard @ 2048,
  go1football-defender @ 4096 (single-chip here; multi-host is dryrun-only).

Usage:
  python tools/bench_matrix.py                 # full matrix
  python tools/bench_matrix.py --soa-ab        # + AoS-dynamics A/B columns
  python tools/bench_matrix.py --configs go1gate:512 go1seesaw:1024
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CONFIGS = [
    "go1gate:512",
    "go1gate:2048",
    "go1gate:4096",
    "go1seesaw:1024",
    "go1sheep-hard:2048",
    "go1football-defender:4096",
]


def bench_one(task: str, num_envs: int, steps: int, use_soa: bool, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from mqe_tpu.envs import make_mqe_env

    wrap, _ = make_mqe_env(task, num_envs=num_envs, seed=seed)
    if not use_soa:
        env = wrap.env
        env.scene = dataclasses.replace(env.scene, use_soa=False)
    key = jax.random.PRNGKey(0)
    ts, _ = wrap.reset(key)
    A = getattr(wrap, "controlled_agents", wrap.num_agents)
    actions = jnp.zeros((num_envs, A, 3)).at[..., 0].set(0.5)

    @jax.jit
    def chunk(ts, key):
        def body(carry, _):
            ts, key = carry
            key, k = jax.random.split(key)
            ts, obs, rew, done, info = wrap._step_impl(ts, actions, k)
            return (ts, key), rew.mean()

        (ts, key), r = jax.lax.scan(body, (ts, key), None, length=steps)
        return ts, key, r.mean()

    t_c0 = time.time()
    ts, key, _ = chunk(ts, key)
    jax.block_until_ready(ts)
    compile_s = time.time() - t_c0
    t0 = time.time()
    n_chunks = 3
    for _ in range(n_chunks):
        ts, key, r = chunk(ts, key)
    jax.block_until_ready(ts)
    wall = time.time() - t0
    sps = steps * n_chunks * num_envs / wall
    return sps, compile_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=DEFAULT_CONFIGS)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--soa-ab", action="store_true",
                   help="also run the AoS (vmap(substep)) dynamics path for A/B")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()

    rows = []
    for spec in args.configs:
        task, n = spec.rsplit(":", 1)
        n = int(n)
        sps, compile_s = bench_one(task, n, args.steps, use_soa=True)
        row = {
            "task": task,
            "num_envs": n,
            "backend": backend,
            "env_steps_per_s": round(sps, 1),
            "per_env_hz": round(sps / n, 1),
            "compile_s": round(compile_s, 1),
        }
        if args.soa_ab:
            sps_p, _ = bench_one(task, n, args.steps, use_soa=False)
            row["env_steps_per_s_aos"] = round(sps_p, 1)
            row["soa_speedup"] = round(sps / sps_p, 3)
        rows.append(row)
        print(json.dumps(row), flush=True)

    # markdown table for BENCHLOG.md
    print("\n| task | envs | env-steps/s | per-env Hz | compile s |"
          + (" AoS steps/s | SoA speedup |" if args.soa_ab else ""))
    print("|---|---|---|---|---|" + ("---|---|" if args.soa_ab else ""))
    for r in rows:
        line = (f"| {r['task']} | {r['num_envs']} | {r['env_steps_per_s']:,.0f} "
                f"| {r['per_env_hz']:.0f} | {r['compile_s']:.0f} |")
        if args.soa_ab:
            line += f" {r['env_steps_per_s_aos']:,.0f} | {r['soa_speedup']:.2f}x |"
        print(line)


if __name__ == "__main__":
    main()
