"""Benchmark: batched multi-agent iLQR MPC solves/s on the current backend.

BASELINE.json's north-star metric includes "MPC solves/s at 4096 envs": one
solve = a full iLQR trajectory optimization (horizon knots x iterations with
parallel line search) for one env's joint multi-agent command plan. All envs
solve simultaneously in one fused device program.

Prints ONE JSON line like bench.py.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--agents", type=int, default=2)
    p.add_argument("--horizon", type=int, default=20)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mqe_tpu.mpc import CommandModel, ILQRConfig, make_ilqr
    from mqe_tpu.mpc import costs as task_costs
    from mqe_tpu.mpc.command_model import joint_dynamics

    backend = jax.default_backend()
    E, A = args.num_envs, args.agents
    model = CommandModel(dt=0.1, num_agents=A)
    stage, final = task_costs.gate_cost(A)
    solve = jax.jit(
        jax.vmap(
            make_ilqr(
                joint_dynamics(model), stage, final,
                ILQRConfig(horizon=args.horizon, n_iters=args.iters),
            )
        )
    )

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (E, A * 6)) * 0.3
    u0 = jnp.zeros((E, args.horizon, A * 3))
    gate = jnp.tile(jnp.array([3.0, 0.2]), (E, 1))
    goal = jnp.full((E,), 6.0)
    arg = {"gate": gate, "goal_x": goal}

    sol = solve(x0, u0, arg)  # compile + warmup
    jax.block_until_ready(sol.cost)
    n_rep = 5
    t0 = time.time()
    for _ in range(n_rep):
        sol = solve(x0, u0, arg)
    jax.block_until_ready(sol.cost)
    wall = time.time() - t0

    solves_per_s = n_rep * E / wall
    # baseline: no planner exists in the reference; compare against a 1 kHz
    # single-problem CPU iLQR (typical realtime MPC budget per robot)
    baseline = 1000.0
    print(
        json.dumps(
            {
                "metric": f"mpc_solves_per_s_{backend}_{E}envs_{A}agents_H{args.horizon}",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
