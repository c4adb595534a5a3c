"""Receding-horizon command MPC over the vectorized env.

CommandMPC plans a horizon of (vx, vy, yaw-rate) commands per agent with
batched multi-agent iLQR (one joint solve per env, vmapped over all envs)
and executes the first knot, warm-starting the next solve with the shifted
plan. The whole plan->act->step loop is a single jitted device program —
no host round-trips (unlike the reference's per-step numpy boundary,
ref openrl_ws/utils.py:51-61).

Scaling: the solve vmaps over the env axis, so `parallel/mesh.py` env-axis
sharding distributes MPC exactly like the env itself — per-env solves need
no collectives.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mqe_tpu.mpc import costs as task_costs
from mqe_tpu.mpc.command_model import CommandModel, joint_dynamics
from mqe_tpu.mpc.ilqr import ILQRConfig, make_ilqr
from mqe_tpu.ops import quat as quat_ops


@struct.dataclass
class MPCState:
    """Warm-start plan carried across control steps."""

    us: jnp.ndarray  # (E, H, A*3) previous solution, shifted


def planner_state(env, state):
    """EnvState -> (E, A, 6) planner state in env-local coordinates:
    (px, py, yaw, vx, vy, wz) with vx/vy in the yaw frame.

    Origins follow state.terrain_levels when the runtime terrain curriculum
    is on (env._origins_for gathers the level-correct rows; static otherwise).
    """
    ag = state.phys.agents
    env_origins, _ = env._origins_for(state.terrain_levels)
    pos = ag.pos - env_origins[:, None, :]
    yawq = quat_ops.yaw_quat(ag.quat)
    v = quat_ops.quat_rotate_inverse(yawq, ag.lin_vel)
    _, _, yaw = quat_ops.get_euler_xyz(ag.quat)
    return jnp.concatenate(
        [pos[..., :2], yaw[..., None], v[..., :2], ag.ang_vel[..., 2:3]], axis=-1
    )


class CommandMPC:
    """Batched multi-agent command-space MPC for one task.

    task: 'waypoint' | 'gate' | 'pushbox'. args for each solve are built
    from the env's terrain oracle (env_info) or given targets.
    """

    def __init__(
        self,
        env,
        task: str = "waypoint",
        model: CommandModel | None = None,
        ilqr_cfg: ILQRConfig | None = None,
        weights: task_costs.CostWeights | None = None,
    ):
        env = env.env if hasattr(env, "env") else env
        self.env = env
        A = env.num_agents
        self.model = model or CommandModel(dt=0.1, num_agents=A)
        assert self.model.num_agents == A
        self.cfg = ilqr_cfg or ILQRConfig(horizon=20, n_iters=8)
        if self.cfg.u_min == -1.0 and self.cfg.u_max == 1.0:
            # default to the RL action envelope per channel (wrapper
            # ACTION_SCALE [2, .5, .5] x the 0.5 RL prescale, env clip at 1):
            # full forward authority, half lateral/yaw — commands outside
            # this envelope destabilize the gait
            env_lim = tuple([1.0, 0.5, 0.5] * A)
            self.cfg = ILQRConfig(
                horizon=self.cfg.horizon, n_iters=self.cfg.n_iters,
                reg_init=self.cfg.reg_init, reg_min=self.cfg.reg_min,
                reg_max=self.cfg.reg_max, alphas=self.cfg.alphas,
                u_min=tuple(-v for v in env_lim), u_max=env_lim,
            )
        w = weights or task_costs.CostWeights()
        self.task = task
        if task == "waypoint":
            stage, final = task_costs.waypoint_cost(A, w)
        elif task == "gate":
            stage, final = task_costs.gate_cost(A, w)
        elif task == "pushbox":
            stage, final = task_costs.pushbox_cost(A, w)
        else:
            raise ValueError(f"unknown MPC task: {task}")
        dyn = joint_dynamics(self.model)
        self._solve1 = make_ilqr(dyn, stage, final, self.cfg)
        self._solve = jax.jit(jax.vmap(self._solve1))
        # env control steps per planner knot (execute the first knot only)
        self.steps_per_knot = max(int(round(self.model.dt / env.dt)), 1)
        self._plan_step = jax.jit(self._plan_step_impl)

    # ------------------------------------------------------------------
    def init_mpc_state(self) -> MPCState:
        E = self.env.num_envs
        H = self.cfg.horizon
        us = jnp.zeros((E, H, self.model.nu))
        return MPCState(us=us)

    def default_args(self, state):
        """Per-env cost args from the terrain oracle / env geometry."""
        env = self.env
        E, A = env.num_envs, env.num_agents
        if self.task == "gate":
            bt = env.cfg.terrain.BarrierTrack_kwargs
            gate_x = bt["init"]["block_length"] + bt["gate"]["block_length"] / 2
            # level-correct oracle rows under the runtime terrain curriculum
            # (static env_info would go stale as terrain_levels move)
            dev = (
                env.grid_env_info["gate_deviation"][
                    state.terrain_levels, env.env_cols_j
                ]
                if env.curriculum
                else env.env_info["gate_deviation"]
            )  # (E, 2)
            gate = jnp.stack([dev[:, 0] + gate_x, dev[:, 1]], axis=-1)
            goal_x = jnp.full(
                (E,),
                bt["init"]["block_length"]
                + bt["gate"]["block_length"]
                + bt["plane"]["block_length"] / 2,
            )
            return {"gate": gate, "goal_x": goal_x}
        if self.task == "pushbox":
            env_origins, _ = env._origins_for(state.terrain_levels)
            box = state.phys.npcs.pos[:, 0, :2] - env_origins[:, :2]
            push_dir = jnp.broadcast_to(jnp.array([1.0, 0.0]), (E, 2))
            return {"box": box, "push_dir": push_dir}
        # waypoint: 3 m straight ahead of each agent's current position
        x = planner_state(env, state)
        tgt = x[..., :2] + jnp.stack(
            [jnp.full((E, A), 3.0), jnp.zeros((E, A))], axis=-1
        )
        return {"targets": tgt}

    # ------------------------------------------------------------------
    def _plan_step_impl(self, state, mpc: MPCState, key, args):
        """One planner cycle: solve, apply first knot for steps_per_knot env
        steps, shift the plan. Returns (state, mpc, done, cost)."""
        env = self.env
        E, A = env.num_envs, env.num_agents
        x0 = planner_state(env, state).reshape(E, -1)
        sol = self._solve(x0, mpc.us, args)
        u0 = sol.us[:, 0].reshape(E, A, 3)

        def env_step(carry, k):
            st, _ = carry
            st, obs, done, info = env._step_impl(st, u0, k)
            return (st, done), None

        keys = jax.random.split(key, self.steps_per_knot)
        (state, done), _ = jax.lax.scan(
            env_step, (state, jnp.zeros(E, dtype=bool)), keys
        )
        # warm start: shift one knot, repeat the last
        us_next = jnp.concatenate([sol.us[:, 1:], sol.us[:, -1:]], axis=1)
        return state, MPCState(us=us_next), done, sol.cost

    def plan_step(self, state, mpc, key, args=None):
        if args is None:
            args = self.default_args(state)
        return self._plan_step(state, mpc, key, args)

    # ------------------------------------------------------------------
    def run(self, n_cycles: int = 50, seed: int = 0, verbose: bool = False):
        """Closed-loop MPC rollout. Returns (state, mean final progress x)."""
        env = self.env
        key = jax.random.PRNGKey(seed)
        key, k = jax.random.split(key)
        state, _ = env.reset(k)
        mpc = self.init_mpc_state()
        args = self.default_args(state)
        for i in range(n_cycles):
            key, k = jax.random.split(key)
            state, mpc, done, cost = self.plan_step(state, mpc, k, args)
            if verbose and (i % 10 == 0 or i == n_cycles - 1):
                x = planner_state(env, state)
                print(
                    f"cycle {i:3d}  mean x={float(x[..., 0].mean()):.3f} m  "
                    f"cost={float(cost.mean()):.2f}"
                )
        x = planner_state(env, state)
        return state, float(x[..., 0].mean())
