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
    """Per-env running episode sums, flushed into completed-episode aggregates
    at reset — the device-side equivalent of the reference's `episode_sums`
    buffers + `_fill_extras` means (ref legged_robot.py:1063-1076, 669-677).

    Live in a jitted step/update loop: `acc = acc.update(reward, done, terms)`.
    `summarize()` pulls host scalars: per-term mean episode sum over the
    episodes completed since the last `reset_window()`.
    """

    term_sums: dict            # name -> (E,) running sums for live episodes
    ep_return: jnp.ndarray     # (E,) running reward sum
    ep_len: jnp.ndarray        # (E,)
    done_count: jnp.ndarray    # () completed episodes in this window
    done_return_sum: jnp.ndarray
    done_len_sum: jnp.ndarray
    done_term_sums: dict       # name -> () flushed sums of completed episodes
    done_succ_sum: jnp.ndarray # () completed episodes that ever hit success
    track_success: bool = struct.field(pytree_node=False, default=False)

    @staticmethod
    def create(num_envs: int, term_names, track_success: bool = False):
        # distinct buffers per leaf: aliased leaves break donate_argnums
        # ("attempt to donate the same buffer twice")
        z = lambda *s: jnp.zeros(s)
        return EpisodeAccumulator(
            term_sums={k: z(num_envs) for k in term_names},
            ep_return=z(num_envs),
            ep_len=z(num_envs),
            done_count=z(),
            done_return_sum=z(),
            done_len_sum=z(),
            done_term_sums={k: z() for k in term_names},
            done_succ_sum=z(),
            track_success=track_success,
        )

    def update(self, reward_env, done, term_values=None, success=None):
        """reward_env: (E,) per-env reward this step; done: (E,) bool;
        term_values: dict name -> scalar or (E,) per-step term values;
        success: (E,) bool — episode ever-succeeded flag as of this step
        (wrapper info["ep_success"]); flushed at done into success_rate."""
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
        if success is not None:
            acc = acc.replace(
                done_succ_sum=self.done_succ_sum
                + (success.astype(jnp.float32) * d).sum()
            )
        if term_values:
            sums = dict(self.term_sums)
            flushed = dict(self.done_term_sums)
            for k in self.term_sums:
                if k not in term_values:
                    continue
                run = sums[k] + jnp.broadcast_to(term_values[k], sums[k].shape)
                flushed[k] = flushed[k] + (run * d).sum()
                sums[k] = run * (1 - d)
            acc = acc.replace(term_sums=sums, done_term_sums=flushed)
        return acc

    def reset_window(self):
        """Zero the completed-episode aggregates (live-episode sums persist)."""
        return self.replace(
            done_count=jnp.zeros(()),
            done_return_sum=jnp.zeros(()),
            done_len_sum=jnp.zeros(()),
            done_term_sums={k: jnp.zeros(()) for k in self.done_term_sums},
            done_succ_sum=jnp.zeros(()),
        )

    def summarize(self) -> dict:
        n = float(self.done_count)
        d = max(n, 1e-9)
        out = {
            "episodes": n,
            "mean_episode_return": float(self.done_return_sum) / d,
            "mean_episode_length": float(self.done_len_sum) / d,
        }
        for k, v in self.done_term_sums.items():
            out[f"rew_{k}"] = float(v) / d
        if self.track_success:
            out["success_rate"] = float(self.done_succ_sum) / d
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
