"""Stateful gym-style adapter over the pure task wrappers.

Equivalent of the reference's RL-boundary wrappers (ref openrl_ws/utils.py:
40-155): `mqe_openrl_wrapper` (framework boundary with numpy in/out and
per-agent done broadcast), `SingleAgentWrapper` (agents folded into the env
batch), and the 0.5 action pre-scale. Use this to plug external trainers or
scripts that expect the classic gym API; in-framework training (learn/) stays
on the pure-JAX path.
"""
from __future__ import annotations

import numpy as np


class GymAdapter:
    """reset() -> obs; step(actions) -> (obs, rew, done, info). numpy arrays.

    obs: (E, A, obs_dim); actions in [-1, 1]^(E, A, 3); done broadcast per
    agent (E, A) like the reference (ref openrl_ws/utils.py:63-74).
    """

    def __init__(self, wrapper, seed: int = 0, action_prescale: float = 0.5):
        import jax

        self.w = wrapper
        self.action_prescale = action_prescale
        self._key = jax.random.PRNGKey(seed)
        self._ts = None
        self.agent_num = getattr(wrapper, "controlled_agents", wrapper.num_agents)
        self.parallel_env_num = wrapper.num_envs
        self.observation_shape = (wrapper.num_envs, self.agent_num, wrapper.obs_dim)

    def _split(self):
        import jax

        self._key, k = jax.random.split(self._key)
        return k

    def reset(self):
        self._ts, obs = self.w.reset(self._split())
        return np.asarray(obs)

    def step(self, actions):
        import jax.numpy as jnp

        a = jnp.asarray(np.asarray(actions), dtype=jnp.float32) * self.action_prescale
        self._ts, obs, rew, done, info = self.w.step(self._ts, a, self._split())
        done_b = np.broadcast_to(np.asarray(done)[:, None], np.asarray(rew).shape)
        host_info = {
            "time_outs": np.asarray(info["time_outs"]),
            # batch totals, mirroring the reference's drained reward_buffer sums
            "reward_terms": {k: float(np.asarray(v).sum())
                             for k, v in info["reward_terms"].items()},
        }
        return np.asarray(obs), np.asarray(rew), done_b.copy(), host_info


class SingleAgentAdapter(GymAdapter):
    """Folds the agent axis into the env batch for single-agent trainers
    (ref SingleAgentWrapper openrl_ws/utils.py:131-155)."""

    def __init__(self, wrapper, seed: int = 0, reward_scale: float = 1.0):
        super().__init__(wrapper, seed)
        self.reward_scale = reward_scale
        self.parallel_env_num = wrapper.num_envs * self.agent_num
        self.agent_num = 1

    def reset(self):
        obs = super().reset()
        return obs.reshape(self.parallel_env_num, 1, -1)

    def step(self, actions):
        E = self.w.num_envs
        A = getattr(self.w, "controlled_agents", self.w.num_agents)
        obs, rew, done, info = super().step(np.asarray(actions).reshape(E, A, -1))
        return (
            obs.reshape(self.parallel_env_num, 1, -1),
            rew.reshape(self.parallel_env_num, 1) * self.reward_scale,
            done.reshape(self.parallel_env_num, 1),
            info,
        )
