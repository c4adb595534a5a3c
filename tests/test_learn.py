"""Training-stack tests: PPO/MAT updates, locomotion env, gym adapter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqe_tpu.envs import make_mqe_env


@pytest.fixture(scope="module")
def gate():
    wrap, _ = make_mqe_env("go1gate", num_envs=4, seed=0)
    return wrap


def test_ppo_update_improves_nothing_breaks(gate):
    from mqe_tpu.learn.ppo import PPOConfig, PPOTrainer

    tr = PPOTrainer(gate, PPOConfig(rollout_len=2, num_minibatches=2, ppo_epochs=1))
    ts = tr.init_state()
    # updates donate their input state; snapshot params on host first
    before = jax.tree.map(np.asarray, tr.init_params)
    ts, m = tr.update(ts)
    assert np.isfinite(float(m["loss"]))
    delta = jax.tree.map(lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()), before, ts.params)
    assert max(jax.tree.leaves(delta)) > 0


def test_ppo_update_many_chunked(gate):
    from mqe_tpu.learn.ppo import PPOConfig, PPOTrainer

    tr = PPOTrainer(gate, PPOConfig(rollout_len=2, num_minibatches=2, ppo_epochs=1))
    ts = tr.init_state()
    ts, m = tr.update_many(ts, 3)
    assert np.isfinite(float(m["loss"]))
    assert int(ts.update_count) == 3


def test_mat_update(gate):
    from mqe_tpu.learn.mat import MATTrainer
    from mqe_tpu.learn.ppo import PPOConfig

    tr = MATTrainer(gate, PPOConfig(rollout_len=2, num_minibatches=2, ppo_epochs=1))
    ts = tr.init_state()
    ts, m = tr.update(ts)
    assert np.isfinite(float(m["loss"]))


def test_locomotion_env_step():
    from mqe_tpu.learn.locomotion_env import LocomotionEnv

    env = LocomotionEnv(num_envs=4, seed=0)
    key = jax.random.PRNGKey(0)
    ts, obs = env.reset(key)
    assert obs.shape == (4, 1, 70)
    for _ in range(3):
        key, k = jax.random.split(key)
        ts, obs, rew, done, info = env.step(ts, jnp.zeros((4, 1, 12)), k)
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(rew)).all()
    assert rew.shape == (4, 1)
    # zero-action near default posture should collect some tracking reward
    # for small commands, and never NaN
    assert float(ts.cmd_scale) >= 1.0


def test_gym_adapter(gate):
    from mqe_tpu.envs.gym_adapter import GymAdapter, SingleAgentAdapter

    ad = GymAdapter(gate, seed=1)
    obs = ad.reset()
    assert obs.shape == (4, 2, gate.obs_dim)
    o, r, d, info = ad.step(np.zeros((4, 2, 3)))
    assert o.shape == (4, 2, gate.obs_dim) and r.shape == (4, 2) and d.shape == (4, 2)
    assert isinstance(info["reward_terms"], dict)

    sa = SingleAgentAdapter(gate, seed=2)
    o = sa.reset()
    assert o.shape == (8, 1, gate.obs_dim)
    o, r, d, info = sa.step(np.zeros((8, 1, 3)))
    assert o.shape == (8, 1, gate.obs_dim) and r.shape == (8, 1)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
