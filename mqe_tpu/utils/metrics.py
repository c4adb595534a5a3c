"""Episode metrics: device-side accumulators replacing the reference's three
logging mechanisms (SURVEY.md §5 metrics row):

  1. `extras["episode"]` per-term episode reward means at reset
     (ref legged_robot.py:1063-1076)
  2. wrapper reward_buffer dicts drained per-step
     (ref openrl_ws/utils.py:76-90 batch_rewards)
  3. steps/sec counters (new; the reference has none)

All accumulation is jit-side; `summarize` pulls scalars to host.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EpisodeAccumulator:
    """Running per-env episode sums + completed-episode aggregates."""

    term_sums: dict            # name -> (E,) running sums for live episodes
    ep_return: jnp.ndarray     # (E,) running reward sum
    ep_len: jnp.ndarray        # (E,)
    done_count: jnp.ndarray    # () completed episodes
    done_return_sum: jnp.ndarray
    done_len_sum: jnp.ndarray

    @staticmethod
    def create(num_envs: int, term_names):
        z = jnp.zeros(num_envs)
        return EpisodeAccumulator(
            term_sums={k: z for k in term_names},
            ep_return=z,
            ep_len=z,
            done_count=jnp.zeros(()),
            done_return_sum=jnp.zeros(()),
            done_len_sum=jnp.zeros(()),
        )

    def update(self, reward_env, done, term_values=None):
        """reward_env: (E,) per-env reward this step; done: (E,) bool;
        term_values: dict name -> scalar or (E,) per-step term sums."""
        ep_return = self.ep_return + reward_env
        ep_len = self.ep_len + 1.0
        d = done.astype(jnp.float32)
        acc = self.replace(
            ep_return=ep_return * (1 - d),
            ep_len=ep_len * (1 - d),
            done_count=self.done_count + d.sum(),
            done_return_sum=self.done_return_sum + (ep_return * d).sum(),
            done_len_sum=self.done_len_sum + (ep_len * d).sum(),
        )
        if term_values:
            sums = dict(self.term_sums)
            for k, v in term_values.items():
                if k in sums:
                    sums[k] = sums[k] + jnp.broadcast_to(v, sums[k].shape) / sums[k].shape[0]
            acc = acc.replace(term_sums=sums)
        return acc

    def summarize(self) -> dict:
        n = float(self.done_count) + 1e-9
        out = {
            "episodes": float(self.done_count),
            "mean_episode_return": float(self.done_return_sum) / n,
            "mean_episode_length": float(self.done_len_sum) / n,
        }
        for k, v in self.term_sums.items():
            out[f"rew_{k}"] = float(jnp.asarray(v).mean())
        return out


class Throughput:
    """Wall-clock env-steps/s counter (host side)."""

    def __init__(self):
        self.t0 = time.time()
        self.steps = 0

    def add(self, n):
        self.steps += n

    def rate(self):
        return self.steps / max(time.time() - self.t0, 1e-9)


def profile_trace(log_dir: str):
    """Context manager: capture a jax profiler trace viewable in TensorBoard/
    Perfetto. First-class tracing where the reference had none (SURVEY.md §5)."""
    return jax.profiler.trace(log_dir)
