"""Per-episode task-success metric: wrapper flag + accumulator accounting.

The reference publishes training curves but computes no success metric
(docs/index.html plots reward); ours defines one per task (wrappers'
_success hooks) so learning curves can report "X% task success". These
tests pin the mechanics: the ever-succeeded flag latches, resets with the
episode, and flushes into EpisodeAccumulator.summarize()["success_rate"].
"""
import jax
import jax.numpy as jnp
import numpy as np

from mqe_tpu.envs import make_mqe_env
from mqe_tpu.utils.metrics import EpisodeAccumulator


def test_accumulator_success_rate():
    acc = EpisodeAccumulator.create(4, ("a",), track_success=True)
    rew = jnp.ones((4,))
    done = jnp.asarray([True, True, False, False])
    succ = jnp.asarray([True, False, True, False])
    acc = acc.update(rew, done, {"a": jnp.ones((4,))}, success=succ)
    s = acc.summarize()
    assert s["episodes"] == 2.0
    assert s["success_rate"] == 0.5  # one of the two finished episodes
    # window reset zeroes the flushed aggregate
    assert acc.reset_window().summarize()["success_rate"] == 0.0


def test_accumulator_no_success_key_when_untracked():
    acc = EpisodeAccumulator.create(2, ())
    assert "success_rate" not in acc.summarize()


def test_gate_success_latches_and_reports():
    wrap, _ = make_mqe_env("go1gate", num_envs=2, seed=0)
    key = jax.random.PRNGKey(0)
    ts, _ = wrap.reset(key)
    assert "ep_success" in ts.extra

    # teleport BOTH agents of env 0 past the gate; env 1 stays at spawn
    gate = ts.extra["gate"]  # (E, 2) env-relative
    origins = np.asarray(wrap.env.env_origins)
    ag = ts.env.phys.agents
    past_x = origins[0, 0] + float(gate[0, 0]) + 1.0
    newpos = ag.pos.at[0, :, 0].set(past_x)
    ts = ts.replace(env=ts.env.replace(phys=ts.env.phys.replace(
        agents=ag.replace(pos=newpos))))

    acts = jnp.zeros((2, wrap.num_agents, 3))
    ts, _, _, done, info = wrap.step(ts, acts, jax.random.PRNGKey(1))
    succ = np.asarray(info["ep_success"])
    assert succ[0] and not succ[1]
    # the flag latches across subsequent steps even if agents drift back
    ts, _, _, _, info = wrap.step(ts, acts, jax.random.PRNGKey(2))
    assert np.asarray(info["ep_success"])[0]
    # and it is carried in extra for the accumulator at done time
    assert np.asarray(ts.extra["ep_success"])[0]
