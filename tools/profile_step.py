"""Component-level timing of the hot control step on the current backend.

Times (per control step, batch E): locomotion NN, torque path, one physics
decimation substep, termination+reset, observations, and the full step.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="go1gate")
    p.add_argument("--num-envs", type=int, default=512)
    args = p.parse_args()

    from mqe_tpu.envs import make_mqe_env

    wrap, _ = make_mqe_env(args.task, num_envs=args.num_envs, seed=0)
    env = wrap.env if hasattr(wrap, "env") else wrap
    key = jax.random.PRNGKey(0)
    ts, _ = env.reset(key)
    E, A = env.num_envs, env.num_agents
    A_cmd = getattr(wrap, "controlled_agents", A)
    commands = jnp.zeros((E, A_cmd, 3)).at[..., 0].set(0.5)

    full = jax.jit(lambda s, k: env._step_impl(s, commands, k)[0])

    @jax.jit
    def loco(s):
        return env._locomotion_action(s, jnp.zeros((E, A, 3)))

    action = loco(ts)[0]

    @jax.jit
    def torq(s):
        return env._torques(s, action)

    tau = torq(ts)[0]

    @jax.jit
    def phys(s):
        return env._physics(s, tau)

    @jax.jit
    def term(s):
        c = env._physics(s, tau)[1]
        return env._termination(s, c)

    @jax.jit
    def obs(s):
        return env._observations(s)

    @jax.jit
    def freshfn(k):
        return env._reset_all(k)

    print(f"backend={jax.default_backend()} E={E} A={A} task={args.task}")
    t_full = timeit(full, ts, key)
    t_loco = timeit(loco, ts)
    t_torq = timeit(torq, ts)
    t_phys = timeit(phys, ts)
    t_term = timeit(term, ts)
    t_obs = timeit(obs, ts)
    t_fresh = timeit(freshfn, key)
    dec = env.decimation
    print(f"full step      : {t_full*1e3:8.3f} ms  ({t_full/E*1e6:7.2f} us/env)")
    print(f"locomotion NN  : {t_loco*1e3:8.3f} ms")
    print(f"torques (x1)   : {t_torq*1e3:8.3f} ms  (x{dec} in step)")
    print(f"physics (x1)   : {t_phys*1e3:8.3f} ms  (x{dec} in step)")
    print(f"  -> dec loop ~ : {(t_torq+t_phys)*dec*1e3:8.3f} ms")
    print(f"termination    : {t_term*1e3:8.3f} ms (includes physics recompute)")
    print(f"observations   : {t_obs*1e3:8.3f} ms")
    print(f"fresh reset    : {t_fresh*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
