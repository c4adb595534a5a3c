"""Benchmark: aggregate env-steps/s of the flagship go1gate task on real HW.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context: the reference publishes no throughput numbers
(BASELINE.md); its canonical training scale is 500 envs on one GPU. We
measure control-steps/s * num_envs (agent-steps would be 2x). vs_baseline
compares against a 25k env-steps/s ESTIMATE of what a single-GPU Isaac Gym
setup typically sustains at 500 envs on this task class — our own estimate,
NOT a published reference number (the reference publishes none; BASELINE.md).
Default scale is the north-star 4096 envs on accelerators (512 was round 1's
scale; see BENCHLOG.md for the full matrix).
"""
import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="go1gate")
    p.add_argument("--num-envs", type=int, default=None)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mqe_tpu.envs import make_mqe_env

    backend = jax.default_backend()
    # pick an env count that saturates the device
    num_envs = args.num_envs or (4096 if backend != "cpu" else 16)

    wrap, _ = make_mqe_env(args.task, num_envs=num_envs, seed=0)
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

        (ts, key), r = jax.lax.scan(body, (ts, key), None, length=args.steps)
        return ts, key, r.mean()

    # warmup/compile
    ts, key, _ = chunk(ts, key)
    jax.block_until_ready(ts)
    t0 = time.time()
    n_chunks = 3
    for _ in range(n_chunks):
        ts, key, r = chunk(ts, key)
    jax.block_until_ready(ts)
    wall = time.time() - t0

    total_env_steps = args.steps * n_chunks * num_envs
    steps_per_s = total_env_steps / wall
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
            }
        )
    )


if __name__ == "__main__":
    main()
