"""One process of the 2-process `jax.distributed` CPU exercise.

The reference has no distributed backend at all (SURVEY.md §2.1); our
multi-host story is JAX's native one: `jax.distributed.initialize` +
a global mesh spanning every host's devices, with the env axis sharded
across it (parallel/mesh.py docstring). This worker proves that story
end-to-end on CPU: two processes x 4 virtual devices = one 8-device
global mesh, (1) a cross-process collective reduction gives the exact
analytic value, (2) the go1plane task steps with its env axis sharded
across BOTH processes and produces finite rewards everywhere.

Launched by tests/test_multihost.py; also runnable by hand:

  for i in 0 1; do
    python tools/multihost_worker.py --pid $i --nprocs 2 --port 12399 &
  done; wait
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--nprocs", type=int, default=2)
    p.add_argument("--port", type=int, default=12399)
    p.add_argument("--local-devices", type=int, default=4)
    args = p.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags
            + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()
    import jax

    # the environment's sitecustomize pins jax_platforms to the axon TPU
    # plugin; the env var alone is not enough (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.nprocs,
        process_id=args.pid,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()  # global: nprocs * local_devices
    n = len(devs)
    assert n == args.nprocs * args.local_devices, (n, args)
    mesh = Mesh(np.array(devs), axis_names=("env",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("env"))

    # ---- 1) cross-process collective: exact analytic reduction ----
    per = 3
    full = np.arange(n * per, dtype=np.float32)
    x = jax.make_array_from_callback(full.shape, shard, lambda idx: full[idx])
    total = jax.jit(jnp.sum, out_shardings=repl)(x)
    expect = full.sum()
    assert float(total) == float(expect), (float(total), expect)

    # ---- 2) the real workload: env axis sharded across both processes ----
    from mqe_tpu.envs import make_mqe_env

    E = n  # one env per global device
    wrap, _ = make_mqe_env("go1plane", num_envs=E, seed=0)
    ts, _ = wrap.reset(jax.random.PRNGKey(0))  # identical on every process

    def to_global(xv):
        arr = np.asarray(xv)
        if arr.ndim >= 1 and arr.shape[0] == E:
            return jax.make_array_from_callback(
                arr.shape, shard, lambda idx: arr[idx]
            )
        return jax.make_array_from_callback(arr.shape, repl, lambda idx: arr[idx])

    ts = jax.tree.map(to_global, ts)
    acts = jnp.zeros((E, 1, 3)).at[..., 0].set(0.5)

    @jax.jit
    def step(ts, key):
        ts, obs, rew, done, info = wrap._step_impl(ts, acts, key)
        # replicated summary = a real cross-process collective per step
        ok = jnp.isfinite(rew).all() & jnp.isfinite(obs).all()
        return ts, jax.lax.with_sharding_constraint(rew.mean(), repl), ok

    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        ts, rmean, ok = step(ts, k)
    assert bool(ok), "non-finite obs/reward in distributed step"
    print(f"MULTIHOST OK pid={args.pid} nprocs={args.nprocs} "
          f"devices={n} reward_mean={float(rmean):.4f}", flush=True)


if __name__ == "__main__":
    main()
