"""Task wrappers: obs assembly + reward shaping per task, pure-functional.

Ports of the reference wrapper layer (ref mqe/envs/wrappers/*.py): each task
defines a flat Box observation (one-hot agent ids + own/teammate base info +
task-specific oracle state), a Box(3) action space of (vx, vy, yaw) commands
with action_scale [2.0, 0.5, 0.5] (ref go1_pushbox_wrapper.py:16), and dense/
sparse reward shaping. Mutable wrapper attributes (last_box_pos etc.) become
fields in a TaskState pytree so the whole thing jits.

The reference's Go1GateWrapper ships with its logic commented out returning
zeros (ref go1_gate_wrapper.py:68-69, 155) and the football game wrappers
return None obs (go1_football_wrapper.py:136, 157) — here the commented spec
is implemented for real (SURVEY.md §2.4 says treat the comments as the spec).

Per-term, per-env reward sums ((E,) arrays) are returned in
info["reward_terms"] each step (device-side), replacing the reference's
host-side reward_buffer accounting (go1_pushbox_wrapper.py:22-25; drained by
mqe_openrl_wrapper.batch_rewards).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mqe_tpu.envs.go1_env import EnvState, Go1Env, ObsBuf
from mqe_tpu.ops import quat as quat_ops

ACTION_SCALE = np.array([2.0, 0.5, 0.5], dtype=np.float32)


@struct.dataclass
class TaskState:
    env: EnvState
    extra: dict  # task-specific carried arrays (stable key set per task)


def _scales(cfg):
    out = {}
    for k in dir(cfg.rewards.scales):
        if not k.startswith("_"):
            out[k] = getattr(cfg.rewards.scales, k)
    return out


def _perenv(x):
    """(E,) per-env term value: sum over every non-env axis. Matches the
    reference's per-env episode_sums accounting (legged_robot.py:669-677)
    so EpisodeAccumulator's flushed means are true per-episode term means."""
    return x.sum(axis=tuple(range(1, x.ndim))) if x.ndim > 1 else x


class TaskWrapper:
    """Base wrapper; subclasses override obs_dim, _extra_init, _obs, _reward.

    Subclasses with a task-success notion set `has_success = True` and
    implement `_success(state, obs, extra) -> (E,) bool` (the condition
    holding THIS step). The base step carries a per-episode ever-succeeded
    flag in extra["ep_success"] (reset with the episode) and reports it in
    info["ep_success"] so trainers/evaluators can log per-episode success
    rates — the reference has no such metric (its docs curves plot reward;
    docs/index.html), so this is the quantitative bridge to them.
    """

    action_dim = 3
    has_success = False

    def __init__(self, env: Go1Env):
        # train-time option for competitive tasks: per-seat zero-sum reward
        # instead of the reference's agent-0-only channel (see
        # Go1WrestlingWrapper._reward). Must be set before the first
        # reset/step call — the flag is baked into the jitted step at trace
        # time. selfplay_punishment overrides the config's own-fall penalty
        # scale for self-play only (None = config value); with the
        # reference's S=10/P=1 wrestling scales, mutual-fall brawling is
        # near-optimal — P=S trains defensiveness (measured r5, BENCHLOG).
        self.selfplay = False
        self.selfplay_punishment = None
        self.env = env
        self.cfg = env.cfg
        self.num_envs = env.num_envs
        self.num_agents = env.num_agents
        self.num_npcs = env.num_npcs
        self.scales = _scales(env.cfg)
        self.bt = getattr(env.cfg.terrain, "BarrierTrack_kwargs", None)
        self._step_jit = jax.jit(self._step_impl)
        self._reset_jit = jax.jit(self._reset_impl)

    # ---- per-task hooks ----
    @property
    def obs_dim(self) -> int:
        raise NotImplementedError

    def _extra_init(self, state: EnvState, obs: ObsBuf) -> dict:
        return {}

    def _obs(self, state: EnvState, obs: ObsBuf, extra: dict) -> jnp.ndarray:
        raise NotImplementedError

    def _reward(self, state: EnvState, obs: ObsBuf, extra: dict, actions, info):
        """Returns (reward (E, A), new_extra, terms dict of (E,) sums)."""
        E = self.num_envs
        return jnp.zeros((E, self.num_agents)), extra, {}

    def _success(self, state: EnvState, obs: ObsBuf, extra: dict):
        """(E,) bool: task-success condition holds this step (see class doc)."""
        raise NotImplementedError

    # ---- shared helpers ----
    def _ids(self):
        A = self.num_agents
        eye = jnp.eye(A, dtype=jnp.float32)
        return jnp.broadcast_to(eye, (self.num_envs, A, A))

    def _base_info(self, obs: ObsBuf):
        """(E, A, 6): base_pos(3, env-relative) + base_rpy(3)."""
        return jnp.concatenate([obs.base_pos, obs.base_rpy], axis=-1)

    def _gate_x(self, *blocks):
        """x-offset of the gate center from the env origin given preceding
        block names + half of the gate block."""
        off = 0.0
        for b in blocks:
            off += self.bt[b]["block_length"]
        return off

    def _block_x(self, name, occurrence=0, frac=0.0):
        """x-offset (from the env origin) of the start of the
        `occurrence`-th block named `name` in the configured block list,
        plus `frac` of that block's length. Walks cfg's actual options list
        so success/goal geometry survives config edits (VERDICT r4 #8)."""
        off, seen = 0.0, 0
        for b in self.bt["options"]:
            if b == name:
                if seen == occurrence:
                    return off + frac * self.bt[b]["block_length"]
                seen += 1
            off += self.bt[b]["block_length"]
        raise KeyError(f"block {name!r} (occurrence {occurrence}) not in options")

    def _gate_pos(self, obs: ObsBuf, x_offset: float):
        """(E, 2) world-relative gate center from terrain oracle info."""
        dev = obs.env_info["gate_deviation"]
        return jnp.stack([dev[:, 0] + x_offset, dev[:, 1]], axis=-1)

    # ---- public API ----
    def _reset_impl(self, key):
        state = self.env._reset_all(key)
        obs_buf = self.env._observations(state)
        extra = self._extra_init(state, obs_buf)
        if self.has_success:
            extra = {**extra, "ep_success": jnp.zeros((self.num_envs,), bool)}
        ts = TaskState(env=state, extra=extra)
        return ts, self._obs(state, obs_buf, extra)

    def reset(self, key):
        return self._reset_jit(key)

    def _step_impl(self, ts: TaskState, actions, key):
        actions = jnp.clip(actions, -1.0, 1.0)
        cmds = self._transform_actions(actions) * jnp.asarray(ACTION_SCALE)
        pre_state, carry = self.env._step_pre(ts.env, cmds, key)
        state, obs_buf, done, info = self.env._step_finish(pre_state, carry)
        reward, extra, terms = self._reward(state, obs_buf, ts.extra, actions, info)
        if self.selfplay:
            # train-time competitive mode: replace the reference's
            # agent-0-only channel with a per-seat zero-sum reward computed
            # on the PRE-reset state (termination-coincident falls happen on
            # exactly the step whose post-reset obs is a fresh spawn — the
            # reference's own reward reads post-reset obs and thus almost
            # never fires; see Go1WrestlingWrapper._selfplay_reward)
            reward = self._selfplay_reward(
                pre_state, self.env._observations(pre_state), reward, ts.extra
            )
        # diff-based rewards must reinitialize across resets: refresh extras
        # for reset envs (reference zeroes via env.reset_ids indexing)
        fresh_extra = self._extra_init(state, obs_buf)
        if self.has_success:
            # success may have been achieved on any earlier step of the
            # episode; carry the ever-flag and report it at done so episode
            # success rates can be accumulated device-side. Evaluated on the
            # PRE-reset state: termination-coincident successes (wrestling
            # opponent falling, bridge push-off) happen on exactly the step
            # whose post-reset state is a fresh spawn, so reading post-reset
            # (as the reference does, go1_wrestling_wrapper.py:55-67) pins
            # those success rates at ~0.
            pre_obs = self.env._observations(pre_state)
            ever = ts.extra["ep_success"] | self._success(pre_state, pre_obs, ts.extra)
            info = dict(info)
            info["ep_success"] = ever
            extra = {**extra, "ep_success": ever}
            fresh_extra = {
                **fresh_extra,
                "ep_success": jnp.zeros((self.num_envs,), bool),
            }
        mask = info["reset_mask"]

        def sel(new, old):
            m = mask.reshape((self.num_envs,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        extra = jax.tree.map(sel, fresh_extra, extra)
        obs = self._obs(state, obs_buf, extra)
        info = dict(info)
        info["reward_terms"] = terms
        return TaskState(env=state, extra=extra), obs, reward, done, info

    def _transform_actions(self, actions):
        """Hook for competitive wrappers that mirror agent 1's actions."""
        return actions

    def _selfplay_reward(self, pre_state, pre_obs, reward, extra):
        """Hook: per-seat zero-sum reward for shared-policy self-play
        (wrap.selfplay = True). Default: unchanged task reward."""
        return reward

    def observe(self, ts) -> jnp.ndarray:
        """Task observation from a TaskState (used by the RL loop)."""
        return self._obs(ts.env, self.env._observations(ts.env), ts.extra)

    def rl_prescale(self, action):
        """Network output -> wrapper action space. The reference applies a
        0.5 pre-scale at the RL boundary (ref openrl_ws/utils.py:59)."""
        return 0.5 * jnp.tanh(action)

    def step(self, ts, actions, key):
        return self._step_jit(ts, actions, key)


class EmptyWrapper(TaskWrapper):
    """go1plane: raw env passthrough (ref empty_wrapper.py)."""

    @property
    def obs_dim(self):
        return self.num_agents + 12

    def _obs(self, state, obs, extra):
        bi = self._base_info(obs)
        return jnp.concatenate([self._ids(), bi, jnp.flip(bi, axis=1)], axis=-1)


class Go1GateWrapper(TaskWrapper):
    """Cooperative gate passage; rewards per the reference's commented spec
    (ref go1_gate_wrapper.py:84-154)."""

    has_success = True

    @property
    def obs_dim(self):
        return 14 + self.num_agents

    def _success(self, state, obs, extra):
        # all agents through the gate (same threshold as the success term)
        return (obs.base_pos[..., 0] > extra["gate"][:, 0:1] + 0.25).all(axis=1)

    def _gate(self, obs):
        return self._gate_pos(obs, self.bt["init"]["block_length"] + self.bt["gate"]["block_length"] / 2)

    def _extra_init(self, state, obs):
        gate = self._gate(obs)                         # (E, 2)
        A = self.num_agents
        tgt_x = (
            self.bt["init"]["block_length"]
            + self.bt["gate"]["block_length"]
            + self.bt["plane"]["block_length"] / 2
        )
        w = self.bt["track_width"]
        tgt = jnp.stack(
            [
                jnp.full((self.num_envs, A), tgt_x),
                jnp.broadcast_to(
                    jnp.asarray([w / 4, -w / 4][:A] if A <= 2 else [0.0] * A),
                    (self.num_envs, A),
                ),
            ],
            axis=-1,
        )
        d0 = jnp.linalg.norm(obs.base_pos[..., :2] - tgt, axis=-1)
        return {"target": tgt, "last_dist": d0, "gate": gate}

    def _obs(self, state, obs, extra):
        bi = self._base_info(obs)
        gate = extra["gate"][:, None, :].repeat(self.num_agents, 1)
        return jnp.concatenate([self._ids(), bi, jnp.flip(bi, axis=1), gate], axis=-1)

    def _reward(self, state, obs, extra, actions, info):
        E, A = self.num_envs, self.num_agents
        s = self.scales
        rew = jnp.zeros((E, A))
        terms = {}
        dist = jnp.linalg.norm(obs.base_pos[..., :2] - extra["target"], axis=-1)
        if s.get("target_reward_scale", 0) != 0:
            prog = (extra["last_dist"] - dist).sum(axis=1, keepdims=True)
            prog = jnp.where(info["reset_mask"][:, None], 0.0, prog)
            r = s["target_reward_scale"] * prog
            rew = rew + r
            terms["target reward"] = _perenv(r)
        if s.get("success_reward_scale", 0) != 0:
            gate_x = extra["gate"][:, 0:1]
            succ = (obs.base_pos[..., 0] > gate_x + 0.25).astype(jnp.float32)
            r = s["success_reward_scale"] * succ
            rew = rew + r
            terms["success reward"] = _perenv(r)
        if s.get("contact_punishment_scale", 0) != 0:
            r = s["contact_punishment_scale"] * state.collide.astype(jnp.float32)
            rew = rew + r[:, None]
            terms["contact punishment"] = _perenv(r)
        if s.get("agent_distance_punishment_scale", 0) != 0 and A > 1:
            other = jnp.flip(obs.base_pos[..., :2], axis=1)
            d2 = ((obs.base_pos[..., :2] - other) ** 2).sum(-1)
            pun = jnp.where(d2 < 0.25, s["agent_distance_punishment_scale"] / jnp.maximum(d2, 1e-3), 0.0)
            rew = rew + pun
            terms["agent distance punishment"] = _perenv(pun)
        extra = {**extra, "last_dist": dist}
        return rew, extra, terms


class Go1PushboxWrapper(TaskWrapper):
    """(ref go1_pushbox_wrapper.py)."""

    has_success = True

    @property
    def obs_dim(self):
        return 20 + self.num_agents

    def _success(self, state, obs, extra):
        # box pushed through the gate
        return self._box_pos(state)[:, 0] > extra["gate"][:, 0] + 0.25

    def _gate(self, obs):
        return self._gate_pos(obs, self.bt["init"]["block_length"] + self.bt["gate"]["block_length"] / 2)

    def _box_pos(self, state):
        return state.phys.npcs.pos[:, 0, :] - self.env.env_origins

    def _extra_init(self, state, obs):
        return {"gate": self._gate(obs), "last_box": self._box_pos(state)}

    def _obs(self, state, obs, extra):
        A = self.num_agents
        bi = self._base_info(obs)
        gate = extra["gate"][:, None, :].repeat(A, 1)
        box = self._box_pos(state)[:, None, :2].repeat(A, 1)
        bq = state.phys.npcs.quat[:, 0][:, None, :].repeat(A, 1)
        return jnp.concatenate([self._ids(), bi, jnp.flip(bi, 1), gate, box, bq], axis=-1)

    def _reward(self, state, obs, extra, actions, info):
        E, A = self.num_envs, self.num_agents
        s = self.scales
        box = self._box_pos(state)
        dx = box[:, 0] - extra["last_box"][:, 0]
        dx = jnp.where(info["reset_mask"], 0.0, dx)
        r = s.get("box_x_movement_reward_scale", 10) * dx
        rew = jnp.broadcast_to(r[:, None], (E, A))
        extra = {**extra, "last_box": box}
        return rew, extra, {"box movement reward": _perenv(r)}


class Go1SheepWrapper(TaskWrapper):
    """(ref go1_sheep_wrapper.py)."""

    has_success = True

    @property
    def obs_dim(self):
        return 14 + 2 * self.num_npcs + self.num_agents

    def _success(self, state, obs, extra):
        # whole flock herded through the gate
        sheep_x = self._sheep_pos(state)[..., 0]
        return (sheep_x > extra["gate"][:, 0:1]).all(axis=1)

    def _gate(self, obs):
        return self._gate_pos(
            obs,
            self.bt["init"]["block_length"]
            + self.bt["plane"]["block_length"]
            + self.bt["gate"]["block_length"] / 2,
        )

    def _sheep_pos(self, state):
        return state.phys.npcs.pos - self.env.env_origins[:, None, :]

    def _extra_init(self, state, obs):
        sheep = self._sheep_pos(state)
        return {"gate": self._gate(obs), "last_avg": sheep[..., 0].mean(axis=1)}

    def _obs(self, state, obs, extra):
        A = self.num_agents
        bi = self._base_info(obs)
        gate = extra["gate"][:, None, :].repeat(A, 1)
        sheep = self._sheep_pos(state)[..., :2].reshape(self.num_envs, 1, -1).repeat(A, 1)
        return jnp.concatenate([self._ids(), bi, jnp.flip(bi, 1), gate, sheep], axis=-1)

    def _reward(self, state, obs, extra, actions, info):
        E, A = self.num_envs, self.num_agents
        s = self.scales
        sheep = self._sheep_pos(state)
        gate_x = extra["gate"][:, 0]
        rew = jnp.zeros((E, 1))
        terms = {}
        if s.get("success_reward_scale", 0) != 0:
            succ = (sheep[..., 0] > gate_x[:, None]).sum(axis=1).astype(jnp.float32)
            r = s["success_reward_scale"] * succ
            rew = rew + r[:, None]
            terms["success reward"] = _perenv(r)
        if s.get("contact_punishment_scale", 0) != 0:
            r = s["contact_punishment_scale"] * state.collide.astype(jnp.float32)
            rew = rew + r[:, None]
            terms["contact punishment"] = _perenv(r)
        if s.get("sheep_movement_reward_scale", 0) != 0:
            avg = sheep[..., 0].mean(axis=1)
            dx = jnp.where(info["reset_mask"], 0.0, avg - extra["last_avg"])
            r = s["sheep_movement_reward_scale"] * dx
            rew = rew + r[:, None]
            terms["sheep movement reward"] = _perenv(r)
            extra = {**extra, "last_avg": avg}
        if s.get("mixed_sheep_reward_scale", 0) != 0:
            d = jnp.linalg.norm(sheep[..., :2] - extra["gate"][:, None, :], axis=-1)
            m = jnp.exp(-d / 2) * s["mixed_sheep_reward_scale"]
            m = jnp.where(sheep[..., 0] >= gate_x[:, None], s["mixed_sheep_reward_scale"], m)
            r = m.sum(axis=1)
            rew = rew + r[:, None]
            terms["mixed sheep reward"] = _perenv(r)
        var = state.phys.npcs.pos[..., :2].var(axis=1).sum(-1)
        lin = s.get("sheep_pos_var_lin_punishment_scale", 0)
        exp_ = s.get("sheep_pos_var_exp_punishment_scale", 0)
        if lin != 0 or exp_ != 0:
            r = lin * (var - 1) + exp_ * jnp.exp(var / 2 - 1)
            rew = rew + r[:, None]
            terms["sheep pos var punishment"] = _perenv(r)
        return jnp.broadcast_to(rew, (E, A)), extra, terms


class Go1SeesawWrapper(TaskWrapper):
    """(ref go1_seesaw_wrapper.py)."""

    has_success = True

    @property
    def obs_dim(self):
        return 12 + self.num_agents

    @property
    def _succ_thresholds(self):
        """(x, z) for the elevated-far-platform success. Derived from the
        seesaw pivot pose (cfg init_states_npc): the reference hard-codes
        7.7/1.3 for a pivot at (8.0, z=1.0) (ref go1_seesaw_wrapper.py:108);
        we keep that geometry relative to the configured pivot."""
        npc = self.env.cfg.init_state.init_states_npc[0].pos
        return npc[0] - 0.3, npc[2] + 0.3

    def _success(self, state, obs, extra):
        # an agent reached the elevated far platform (success-term condition)
        sx, sz = self._succ_thresholds
        x = obs.base_pos[..., 0]
        z = obs.base_pos[..., 2]
        return ((x > sx) & (z > sz)).any(axis=1)

    def _extra_init(self, state, obs):
        return {"last_x": obs.base_pos[..., 0]}

    def _obs(self, state, obs, extra):
        bi = self._base_info(obs)
        return jnp.concatenate([self._ids(), bi, jnp.flip(bi, 1)], axis=-1)

    def _reward(self, state, obs, extra, actions, info):
        E, A = self.num_envs, self.num_agents
        s = self.scales
        rew = jnp.zeros((E, 1))
        terms = {}
        x = obs.base_pos[..., 0]
        z = obs.base_pos[..., 2]
        if s.get("x_movement_reward_scale", 0) != 0:
            dx = (x - extra["last_x"]).sum(axis=1)
            dx = jnp.where(info["reset_mask"], 0.0, dx)
            r = s["x_movement_reward_scale"] * dx
            rew = rew + r[:, None]
            terms["x movement reward"] = _perenv(r)
        extra = {**extra, "last_x": x}
        if s.get("height_reward_scale", 0) != 0:
            r = s["height_reward_scale"] * (z.sum(axis=1) - 0.56)
            rew = rew + r[:, None]
            terms["height reward"] = _perenv(r)
        if s.get("y_punishment_scale", 0) != 0:
            r = s["y_punishment_scale"] * ((obs.base_pos[..., 1] ** 2).sum(axis=1) - 0.5)
            rew = rew + r[:, None]
            terms["y punishment"] = _perenv(r)
        if s.get("contact_punishment_scale", 0) != 0:
            r = s["contact_punishment_scale"] * state.collide.astype(jnp.float32)
            rew = rew + r[:, None]
            terms["contact punishment"] = _perenv(r)
        if s.get("agent_distance_punishment_scale", 0) != 0 and A > 1:
            other = jnp.flip(obs.base_pos[..., :2], axis=1)
            d2 = ((obs.base_pos[..., :2] - other) ** 2).sum(-1)[:, :1]
            pun = jnp.where(d2 < 0.25, s["agent_distance_punishment_scale"] / jnp.maximum(d2, 1e-3), 0.0)
            rew = rew + pun
            terms["agent distance punishment"] = _perenv(pun)
        if s.get("success_reward_scale", 0) != 0:
            sx, sz = self._succ_thresholds
            succ = ((x > sx) & (z > sz)).sum(axis=1).astype(jnp.float32)
            r = s["success_reward_scale"] * succ
            rew = rew + r[:, None]
            terms["success reward"] = _perenv(r)
        if s.get("fall_punishment_scale", 0) != 0:
            fall = (state.r_term | state.p_term).astype(jnp.float32)
            r = s["fall_punishment_scale"] * fall
            rew = rew + r[:, None]
            terms["fall punishment"] = _perenv(r)
        return jnp.broadcast_to(rew, (E, A)), extra, terms


class Go1FootballDefenderWrapper(TaskWrapper):
    """2 attackers vs scripted defender (ref go1_football_wrapper.py:8-91).
    Wrapper controls only the first two agents."""

    controlled_agents = 2
    has_success = True

    @property
    def obs_dim(self):
        return 18 + 2

    def _success(self, state, obs, extra):
        # ball in the goal past the defender
        return self._ball(state)[:, 0] > self._gate(state)[0]

    def _gate(self, state):
        # goal line = far end of the pitch plane (walk the configured block
        # list rather than hard-coding the init+plane sequence)
        gx = self._block_x("plane", frac=1.0)
        return jnp.asarray([gx, 0.0])

    def _extra_init(self, state, obs):
        return {}

    def _ball(self, state):
        return state.phys.npcs.pos[:, 0, :] - self.env.env_origins

    def _obs(self, state, obs, extra):
        bi = self._base_info(obs)[:, :2, :]
        ids = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (self.num_envs, 2, 2))
        ball = self._ball(state)[:, None, :].repeat(2, 1)
        bv = state.phys.npcs.lin_vel[:, 0][:, None, :].repeat(2, 1)
        return jnp.concatenate([ids, bi, jnp.flip(bi, 1), ball, bv], axis=-1)

    def _reward(self, state, obs, extra, actions, info):
        E = self.num_envs
        s = self.scales
        ball = self._ball(state)
        gate = self._gate(state)
        rew = jnp.zeros((E, 1))
        terms = {}
        if s.get("goal_reward_scale", 0) != 0:
            r = jnp.where(ball[:, 0] > gate[0], s["goal_reward_scale"], 0.0)
            rew = rew + r[:, None]
            terms["goal reward"] = _perenv(r)
        if s.get("ball_gate_distance_reward_scale", 0) != 0:
            d = jnp.linalg.norm(ball[:, :2] - gate[None, :], axis=-1)
            r = s["ball_gate_distance_reward_scale"] * jnp.exp(-d / 3)
            rew = rew + r[:, None]
            terms["ball gate distance reward"] = _perenv(r)
        return jnp.broadcast_to(rew, (E, 2)), extra, terms


class Go1FootballGameWrapper(TaskWrapper):
    """1v1 / 2v2 football. The reference wrapper is scaffolding (returns None
    obs, zero reward — ref go1_football_wrapper.py:93-157); implemented here
    for real: two teams, goal at each end, zero-sum goal reward."""

    has_success = True

    @property
    def obs_dim(self):
        return 18 + self.num_agents

    def _success(self, state, obs, extra):
        # team 0 scored (ball past the right goal line = second gate block)
        return self._ball(state)[:, 0] > self._block_x("gate", occurrence=1)

    def _extra_init(self, state, obs):
        return {}

    def _ball(self, state):
        return state.phys.npcs.pos[:, 0, :] - self.env.env_origins

    def _obs(self, state, obs, extra):
        A = self.num_agents
        bi = self._base_info(obs)
        ball = self._ball(state)[:, None, :].repeat(A, 1)
        bv = state.phys.npcs.lin_vel[:, 0][:, None, :].repeat(A, 1)
        return jnp.concatenate([self._ids(), bi, jnp.flip(bi, 1), ball, bv], axis=-1)

    def _reward(self, state, obs, extra, actions, info):
        E, A = self.num_envs, self.num_agents
        s = self.scales
        ball = self._ball(state)
        gx_right = self._block_x("gate", occurrence=1)
        gx_left = self._block_x("gate", occurrence=0)
        goal_r = (ball[:, 0] > gx_right).astype(jnp.float32)
        goal_l = (ball[:, 0] < gx_left).astype(jnp.float32)
        scale = s.get("goal_reward_scale", 10)
        half = A // 2
        team = jnp.asarray([0] * half + [1] * (A - half))
        r_team0 = scale * (goal_r - goal_l)
        rew = jnp.where(team[None, :] == 0, r_team0[:, None], -r_team0[:, None])
        return rew, extra, {"goal reward": scale * (goal_r + goal_l)}


def _mirror_y(actions):
    """Mirror agent 1's (vy, yaw) for symmetric competitive tasks
    (ref go1_wrestling_wrapper.py:47 etc.)."""
    return actions.at[:, 1, 1:].multiply(-1.0)


class Go1TugWrapper(TaskWrapper):
    """(ref go1_tug_wrapper.py)."""

    has_success = True

    @property
    def obs_dim(self):
        return 10

    def _success(self, state, obs, extra):
        # agent 0 pulled the disc to its side (q < 0)
        return state.phys.npcs.q[:, 0, 0] < 0

    def _transform_actions(self, actions):
        return _mirror_y(actions)

    def _npc_dof(self, state):
        q = state.phys.npcs.q[:, 0, 0]
        qd = state.phys.npcs.qd[:, 0, 0]
        return q, qd

    def _extra_init(self, state, obs):
        q, _ = self._npc_dof(state)
        bi = self._base_info(obs)
        return {"last_dis": bi[..., :2], "last_npc": q}

    def _obs(self, state, obs, extra):
        E, A = self.num_envs, self.num_agents
        bi = self._base_info(obs)
        q, qd = self._npc_dof(state)
        dis = obs.base_pos[..., :2] - jnp.stack(
            [jnp.full((E,), 1.6), q], axis=-1
        )[:, None, :]
        dis = jnp.linalg.norm(dis, axis=-1, keepdims=True)
        npc = jnp.stack([q, qd], axis=-1)[:, None, :].repeat(A, 1)
        lastq = extra["last_npc"][:, None, None].repeat(A, 1)
        o = jnp.concatenate([bi, npc, dis, lastq], axis=-1)
        # mirror agent 1's lateral quantities (ref go1_tug_wrapper.py:53-56)
        o = o.at[:, 1, 1].multiply(-1.0)
        o = o.at[:, 1, 4].multiply(-1.0)
        o = o.at[:, 1, 6].multiply(-1.0)
        o = o.at[:, 1, -1].multiply(-1.0)
        return o

    def _reward(self, state, obs, extra, actions, info):
        E, A = self.num_envs, self.num_agents
        s = self.scales
        q, _ = self._npc_dof(state)
        rew = jnp.zeros((E, A))
        terms = {}
        lastq = extra["last_npc"]
        if s.get("success_reward_scale", 0) != 0:
            r = jnp.where(q < 0, s["success_reward_scale"] * (-q), 0.0)
            r = jnp.where(lastq <= q, r / 2, r)
            rew = rew.at[:, 0].add(r)
            terms["success reward"] = _perenv(r)
        if s.get("punishment_reward_scale", 0) != 0:
            pn = jnp.where(q > 0, s["punishment_reward_scale"] * q, 0.0)
            pn = jnp.where(lastq > q, pn / 2, pn)
            rew = rew.at[:, 0].add(-pn)
            terms["punishment"] = _perenv(pn)
        base0 = obs.base_pos[:, 0, :2]
        last0 = extra["last_dis"][:, 0, :]
        d_now = jnp.linalg.norm(base0 - jnp.stack([jnp.full((E,), 1.6), q], -1), axis=-1)
        d_last = jnp.linalg.norm(last0 - jnp.stack([jnp.full((E,), 1.6), q], -1), axis=-1)
        if s.get("pos_reward_scale", 0) != 0:
            r = jnp.where(d_now < d_last, (d_last - d_now) * s["pos_reward_scale"], 0.0)
            rew = rew.at[:, 0].add(r)
            terms["pos reward"] = _perenv(r)
        if s.get("pos_punishment_scale", 0) != 0:
            pn = jnp.where(d_now >= d_last, 2.0**d_now * s["pos_punishment_scale"], 0.0)
            rew = rew.at[:, 0].add(-pn)
            terms["pos punishment"] = _perenv(pn)
        extra = {"last_dis": obs.base_pos[..., :2], "last_npc": q}
        return rew, extra, terms

    def _selfplay_reward(self, pre_state, pre_obs, reward, extra):
        """Per-seat mirror of the reference's agent-0 reward laws (ref
        go1_tug_wrapper.py:89-113) for shared-policy self-play: seat 0
        wins as the disc DOF goes negative, seat 1 as it goes positive
        (the wrapper mirrors seat 1's lateral frame), each with the same
        improvement-halving and handle-distance shaping evaluated on its
        OWN base. Evaluated on the pre-reset state."""
        E = self.num_envs
        s = self.scales
        q = pre_state.phys.npcs.q[:, 0, 0]
        lastq = extra["last_npc"]
        # per-seat "favor": how far the disc sits on MY side
        sgn = jnp.asarray([-1.0, 1.0])
        favor = q[:, None] * sgn
        lastfavor = lastq[:, None] * sgn
        improving = lastfavor < favor
        S = s.get("success_reward_scale", 0.0)
        P = s.get("punishment_reward_scale", 0.0)
        win = jnp.where(favor > 0, S * favor, 0.0)
        win = jnp.where(improving, win, win / 2)
        lose = jnp.where(favor < 0, P * (-favor), 0.0)
        lose = jnp.where(improving, lose / 2, lose)
        handle = jnp.stack([jnp.full((E,), 1.6), q], axis=-1)[:, None, :]
        d_now = jnp.linalg.norm(pre_obs.base_pos[..., :2] - handle, axis=-1)
        d_last = jnp.linalg.norm(extra["last_dis"] - handle, axis=-1)
        pos_r = jnp.where(
            d_now < d_last, (d_last - d_now) * s.get("pos_reward_scale", 0.0), 0.0
        )
        pos_p = jnp.where(
            d_now >= d_last, 2.0**d_now * s.get("pos_punishment_scale", 0.0), 0.0
        )
        return win - lose + pos_r - pos_p


class Go1WrestlingWrapper(TaskWrapper):
    """(ref go1_wrestling_wrapper.py)."""

    has_success = True

    @property
    def obs_dim(self):
        return 12

    def _success(self, state, obs, extra):
        # agent 0 toppled its opponent (success-term condition for agent 1)
        r_ = quat_ops.wrap_to_pi(obs.base_rpy[:, 1, 0])
        p_ = quat_ops.wrap_to_pi(obs.base_rpy[:, 1, 1])
        return (jnp.abs(p_) > np.pi * 0.9) | (jnp.abs(r_) >= np.pi * 0.4)

    def _transform_actions(self, actions):
        return _mirror_y(actions)

    def _extra_init(self, state, obs):
        return {}

    def _obs(self, state, obs, extra):
        bi = self._base_info(obs)
        o = jnp.concatenate([bi, jnp.flip(bi, 1)], axis=-1)
        for col in (1, 4, 7, 10):
            o = o.at[:, 1, col].multiply(-1.0)
        return o

    def _reward(self, state, obs, extra, actions, info):
        E, A = self.num_envs, self.num_agents
        s = self.scales
        r_ = quat_ops.wrap_to_pi(obs.base_rpy[..., 0])
        p_ = quat_ops.wrap_to_pi(obs.base_rpy[..., 1])
        fallen = (jnp.abs(p_) > np.pi * 0.9) | (jnp.abs(r_) >= np.pi * 0.4)
        rew = jnp.zeros((E, A))
        terms = {}
        if s.get("success_reward_scale", 0) != 0:
            r = jnp.where(fallen[:, 1], s["success_reward_scale"], 0.0)
            rew = rew.at[:, 0].add(r)
            terms["success reward"] = _perenv(r)
        if s.get("punishment_scale", 0) != 0:
            pn = jnp.where(fallen[:, 0], s["punishment_scale"], 0.0)
            rew = rew.at[:, 0].add(-pn)
            terms["punishment"] = _perenv(pn)
        # Reference semantics: reward flows to agent 0's channel ONLY
        # (ref go1_wrestling_wrapper.py:62-81 — no repeat; agent 1 is an
        # unrewarded mirrored seat). For shared-policy self-play training
        # set `wrap.selfplay = True` — see _selfplay_reward.
        return rew, extra, terms

    def _selfplay_reward(self, pre_state, pre_obs, reward, extra):
        """Per-seat zero-sum fall reward on the PRE-reset state.

        Fall = beyond the env's own termination thresholds (roll 0.8 /
        pitch 1.6 rad, z < 0.3 m — Go1WrestlingCfg.termination), because the
        env resets there: the reference's stricter 0.9pi/0.4pi reward
        thresholds are only observable in the rare single-step overshoot,
        leaving self-play with no learning signal. Each seat earns +S when
        its opponent falls and -P when it falls itself (zero-sum when S==P;
        with the config's S=10, P=1 a mutual crash still favors the pusher).
        """
        s = self.scales
        t = self.cfg.termination
        r_ = quat_ops.wrap_to_pi(pre_obs.base_rpy[..., 0])
        p_ = quat_ops.wrap_to_pi(pre_obs.base_rpy[..., 1])
        z = pre_obs.base_pos[..., 2]
        fallen = (
            (jnp.abs(r_) > t.roll_kwargs["threshold"])
            | (jnp.abs(p_) > t.pitch_kwargs["threshold"])
            | (z < t.z_low_kwargs["threshold"])
        )
        S = s.get("success_reward_scale", 0.0)
        P = s.get("punishment_scale", 0.0)
        if self.selfplay_punishment is not None:
            P = self.selfplay_punishment
        opp = jnp.flip(fallen, axis=1)
        return S * opp.astype(jnp.float32) - P * fallen.astype(jnp.float32)


class Go1RotationWrapper(TaskWrapper):
    """(ref go1_rotation_wrapper.py)."""

    has_success = True

    @property
    def obs_dim(self):
        return 12

    def _success(self, state, obs, extra):
        # agent 0 through the revolving door past the target x
        return obs.base_pos[:, 0, 0] > self._target_x()

    def _transform_actions(self, actions):
        return _mirror_y(actions)

    def _target_x(self):
        return self.bt["rotation"]["block_length"] * 0.75 + self.bt["wall"]["block_length"]

    def _extra_init(self, state, obs):
        tx = self._target_x()
        d = jnp.linalg.norm(
            obs.base_pos[..., :2] - jnp.asarray([tx, 0.0])[None, None, :], axis=-1
        )
        return {"last_dis": d}

    def _obs(self, state, obs, extra):
        bi = self._base_info(obs)
        o = jnp.concatenate([bi, jnp.flip(bi, 1)], axis=-1)
        for col in (1, 4, 7, 10):
            o = o.at[:, 1, col].multiply(-1.0)
        return o

    def _reward(self, state, obs, extra, actions, info):
        E, A = self.num_envs, self.num_agents
        s = self.scales
        tx = self._target_x()
        x = obs.base_pos[..., 0]
        rew = jnp.zeros((E, A))
        terms = {}
        if s.get("success_reward_scale", 0) != 0:
            r = jnp.where(x[:, 0] > tx, s["success_reward_scale"], 0.0)
            rew = rew.at[:, 0].add(r)
            terms["success reward"] = _perenv(r)
        if s.get("punishment_scale", 0) != 0:
            pn = jnp.where(x[:, 1] > tx, s["punishment_scale"], 0.0)
            rew = rew.at[:, 0].add(-pn)
            terms["punishment"] = _perenv(pn)
        d = jnp.linalg.norm(obs.base_pos[..., :2] - jnp.asarray([tx, 0.0])[None, None, :], axis=-1)
        if s.get("distance_reward_scale", 0) != 0:
            r = jnp.where(d[:, 0] < extra["last_dis"][:, 0], s["distance_reward_scale"], 0.0)
            rew = rew.at[:, 0].add(r)
            terms["distance reward"] = _perenv(r)
        return rew, {"last_dis": d}, terms

    def _selfplay_reward(self, pre_state, pre_obs, reward, extra):
        """Per-seat mirror of the agent-0 laws (ref go1_rotation_wrapper.py
        reward block): each seat earns +S for passing the door itself,
        -P when its opponent passes, +D for closing its own distance to
        the target (both agents race through in +x, so the laws are
        seat-symmetric as-is). Pre-reset state."""
        s = self.scales
        tx = self._target_x()
        x = pre_obs.base_pos[..., 0]
        d = jnp.linalg.norm(
            pre_obs.base_pos[..., :2] - jnp.asarray([tx, 0.0])[None, None, :], axis=-1
        )
        passed = (x > tx).astype(jnp.float32)
        closer = (d < extra["last_dis"]).astype(jnp.float32)
        S = s.get("success_reward_scale", 0.0)
        P = s.get("punishment_scale", 0.0)
        D = s.get("distance_reward_scale", 0.0)
        return S * passed - P * jnp.flip(passed, 1) + D * closer


class Go1BridgeWrapper(TaskWrapper):
    """(ref go1_bridge_wrapper.py)."""

    has_success = True

    @property
    def obs_dim(self):
        return 12

    def _success(self, state, obs, extra):
        # opponent knocked off the bridge (success-term condition)
        return obs.base_pos[:, 1, 2] < 0.5

    def _transform_actions(self, actions):
        return _mirror_y(actions)

    def _extra_init(self, state, obs):
        return {"target": jnp.flip(obs.base_pos, axis=1)}

    def _obs(self, state, obs, extra):
        bi = self._base_info(obs)
        o = jnp.concatenate([bi, jnp.flip(bi, 1)], axis=-1)
        span = jnp.abs(extra["target"][:, 0, 0] + extra["target"][:, 1, 0])
        o = o.at[:, 1, 0].set(span - o[:, 1, 0])
        o = o.at[:, 1, 4].multiply(-1.0)
        o = o.at[:, 1, 6].set(span - o[:, 1, 6])
        o = o.at[:, 1, 10].multiply(-1.0)
        return o

    def _reward(self, state, obs, extra, actions, info):
        E, A = self.num_envs, self.num_agents
        s = self.scales
        z = obs.base_pos[..., 2]
        x = obs.base_pos[..., 0]
        rew = jnp.zeros((E, A))
        terms = {}
        if s.get("success_reward_scale", 0) != 0:
            r = jnp.where(z[:, 1] < 0.5, s["success_reward_scale"], 0.0)
            rew = rew.at[:, 0].add(r)
            terms["success reward"] = _perenv(r)
        if s.get("punishment_scale", 0) != 0:
            pn = jnp.where(z[:, 0] < 0.5, s["punishment_scale"], 0.0)
            rew = rew.at[:, 0].add(-pn)
            terms["punishment"] = _perenv(pn)
        if s.get("target_reward_scale", 0) != 0:
            r = jnp.where(x[:, 0] > extra["target"][:, 0, 0], s["target_reward_scale"], 0.0)
            rew = rew.at[:, 0].add(r)
            terms["target reward"] = _perenv(r)
        return rew, extra, terms

    def _selfplay_reward(self, pre_state, pre_obs, reward, extra):
        """Per-seat mirror of the agent-0 laws (ref go1_bridge_wrapper.py
        reward block): +S when the opponent drops below the bridge deck
        (z < 0.5), -P for falling oneself, +T for reaching the opponent's
        start (agent 0 crosses in +x, agent 1 in -x, so its target test is
        mirrored). Pre-reset state."""
        s = self.scales
        z = pre_obs.base_pos[..., 2]
        x = pre_obs.base_pos[..., 0]
        fell = (z < 0.5).astype(jnp.float32)
        crossed0 = x[:, 0] > extra["target"][:, 0, 0]
        crossed1 = x[:, 1] < extra["target"][:, 1, 0]
        crossed = jnp.stack([crossed0, crossed1], axis=1).astype(jnp.float32)
        S = s.get("success_reward_scale", 0.0)
        P = s.get("punishment_scale", 0.0)
        T = s.get("target_reward_scale", 0.0)
        return S * jnp.flip(fell, 1) - P * fell + T * crossed


class Go1DoorWrapper(TaskWrapper):
    """Push-open door (task present but unregistered in the reference;
    simple pass-the-door shaping)."""

    has_success = True

    @property
    def obs_dim(self):
        return 12 + self.num_agents + 2

    def _success(self, state, obs, extra):
        # all agents pushed through the doorway
        gx = self.bt["init"]["block_length"] + self.bt["gate"]["block_length"] / 2
        return (obs.base_pos[..., 0] > gx).all(axis=1)

    def _extra_init(self, state, obs):
        q = state.phys.npcs.q[:, 0, 0]
        return {"last_x": obs.base_pos[..., 0], "door_q": q}

    def _obs(self, state, obs, extra):
        A = self.num_agents
        bi = self._base_info(obs)
        q = state.phys.npcs.q[:, 0, 0]
        qd = state.phys.npcs.qd[:, 0, 0]
        d = jnp.stack([q, qd], -1)[:, None, :].repeat(A, 1)
        return jnp.concatenate([self._ids(), bi, jnp.flip(bi, 1), d], axis=-1)

    def _reward(self, state, obs, extra, actions, info):
        E, A = self.num_envs, self.num_agents
        s = self.scales
        x = obs.base_pos[..., 0]
        rew = jnp.zeros((E, A))
        terms = {}
        if s.get("target_reward_scale", 0) != 0:
            dx = (x - extra["last_x"]).sum(axis=1)
            dx = jnp.where(info["reset_mask"], 0.0, dx)
            r = s["target_reward_scale"] * dx
            rew = rew + r[:, None]
            terms["target reward"] = _perenv(r)
        if s.get("success_reward_scale", 0) != 0:
            gx = self.bt["init"]["block_length"] + self.bt["gate"]["block_length"] / 2
            succ = (x > gx).astype(jnp.float32)
            r = s["success_reward_scale"] * succ
            rew = rew + r
            terms["success reward"] = _perenv(r)
        return rew, {**extra, "last_x": x, "door_q": state.phys.npcs.q[:, 0, 0]}, terms
