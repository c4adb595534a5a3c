"""Multi-chip scale-out: env-axis sharding over a device mesh.

The reference's only parallelism is env vectorization on one GPU (SURVEY.md
§2.1 parallelism table; `--horovod` exists but is dead code, ref
helpers.py:178). Here data parallelism over envs is first-class: the EnvState
pytree is sharded on its leading env axis across a 1-D `env` mesh via
shard_map; per-env physics needs no cross-device communication, collectives
(psum means) appear only in metric reductions and PPO gradient all-reduce.

Works identically on a real TPU slice and on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N), which is how multi-chip
is tested without hardware (tests/test_parallel.py). Multi-host: call
jax.distributed.initialize() first; the mesh then spans all hosts with the
same code.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def env_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=("env",))


def shard_env_axis(tree, mesh: Mesh):
    """Place a batched-over-envs pytree with its leading axis sharded."""
    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P("env")))
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree.map(put, tree)


def sharded_step(wrapper, mesh: Mesh):
    """Build a jitted task-wrapper step with env-axis sharding constraints.

    Returns step(ts, actions, key) -> (ts, obs, rew, done, info) where all
    per-env arrays live sharded across the mesh. XLA partitions the whole
    fused step; since envs are independent, no collectives are inserted in
    the hot loop.
    """
    pspec_env = NamedSharding(mesh, P("env"))

    @jax.jit
    def step(ts, actions, key):
        ts, obs, rew, done, info = wrapper._step_impl(ts, actions, key)
        cons = lambda x: (
            jax.lax.with_sharding_constraint(x, pspec_env)
            if hasattr(x, "ndim") and x.ndim >= 1
            else x
        )
        ts = jax.tree.map(cons, ts)
        obs = cons(obs)
        return ts, obs, rew, done, info

    return step


def sharded_rollout(wrapper, mesh: Mesh, length: int):
    """Jitted fixed-length rollout with the env axis sharded; returns summed
    reward (psum'd across devices implicitly by the final reduction) and the
    final state. This is the bench/eval inner loop."""

    @jax.jit
    def rollout(ts, actions, key):
        def body(carry, _):
            ts, key = carry
            key, k = jax.random.split(key)
            ts, obs, rew, done, info = wrapper._step_impl(ts, actions, k)
            return (ts, key), rew.mean()

        (ts, _), rews = jax.lax.scan(body, (ts, key), None, length=length)
        return ts, rews.mean()

    return rollout
