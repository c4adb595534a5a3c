"""Multi-Agent Transformer (MAT) training.

Completes the reference's algorithm menu (ref openrl_ws/train.py:31-39 uses
OpenRL's MATNet/MATAgent). Architecture per the MAT paper (Wen et al. 2022):

  encoder: per-agent obs embeddings -> self-attention across the AGENT axis
           -> per-agent representations + centralized value head
  decoder: autoregressive across agents — agent i's action mean attends to
           the encoded obs and the actions of agents < i (teacher forcing at
           train time, sequential sampling at rollout)

Trained with the same clipped PPO objective / GAE as learn/ppo.py. The agent
count is tiny (<=4) so the autoregressive loop is statically unrolled.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mqe_tpu.learn.networks import gaussian_logp
from mqe_tpu.learn.ppo import PPOConfig, PPOTrainer, TrainState


class SelfAttnBlock(nn.Module):
    dim: int
    heads: int = 2

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.heads)(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * 2)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        return x + h


class MATNetwork(nn.Module):
    action_dim: int
    embed: int = 128
    enc_blocks: int = 2
    dec_blocks: int = 2

    @nn.compact
    def __call__(self, obs, prev_actions):
        """obs: (..., A, obs_dim); prev_actions: (..., A, act_dim) where row i
        holds the action of agent i-1 (row 0 is zeros / start token).

        Returns (action_mean (..., A, act), log_std (act,), value (..., A)).
        """
        A = obs.shape[-2]
        e = nn.Dense(self.embed)(obs)
        for _ in range(self.enc_blocks):
            e = SelfAttnBlock(self.embed)(e)
        value = nn.Dense(1)(nn.gelu(nn.Dense(self.embed)(e)))[..., 0]

        # decoder with causal mask over agents
        d = nn.Dense(self.embed)(prev_actions) + e
        causal = jnp.tril(jnp.ones((A, A), dtype=bool))
        for _ in range(self.dec_blocks):
            d = SelfAttnBlock(self.embed)(d, mask=causal)
        mean = nn.Dense(self.action_dim,
                        kernel_init=nn.initializers.orthogonal(0.01))(d)
        log_std = self.param("log_std", nn.initializers.constant(-0.5), (self.action_dim,))
        return mean, log_std, value


class MATTrainer(PPOTrainer):
    """PPO machinery with the MAT joint policy. Batches keep the agent axis;
    actions are sampled autoregressively agent-by-agent."""

    def __init__(self, wrapper, config: PPOConfig = PPOConfig(algo="mat"), seed: int = 0):
        assert not config.recurrent, "MAT is a transformer; recurrent mode is PPO-only"
        self.w = wrapper
        self.cfg = config
        self.E = wrapper.num_envs
        self.A = getattr(wrapper, "controlled_agents", wrapper.num_agents)
        self.obs_dim = wrapper.obs_dim
        self.act_dim = wrapper.action_dim
        self.net = MATNetwork(action_dim=self.act_dim)
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        dummy_obs = jnp.zeros((1, self.A, self.obs_dim))
        dummy_prev = jnp.zeros((1, self.A, self.act_dim))
        self.init_params = self.net.init(k1, dummy_obs, dummy_prev)
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(config.lr, eps=1e-5),
        )
        self._update = jax.jit(self._update_impl, donate_argnums=(0,))
        self._init_key = k2
        self.term_names = self._discover_term_names()

    def _policy(self, params, obs, key, h=None):
        """Sequential (autoregressive) sampling across agents.
        (h unused: MAT is a transformer, recurrent mode unsupported.)"""
        A = self.A
        prev = jnp.zeros(obs.shape[:-1] + (self.act_dim,))
        actions = jnp.zeros_like(prev)
        keys = jax.random.split(key, A)
        for i in range(A):
            mean, log_std, value = self.net.apply(params, obs, prev)
            noise = jax.random.normal(keys[i], mean[..., i, :].shape)
            a_i = mean[..., i, :] + jnp.exp(log_std) * noise
            actions = actions.at[..., i, :].set(a_i)
            if i + 1 < A:
                prev = prev.at[..., i + 1, :].set(a_i)
        mean, log_std, value = self.net.apply(params, obs, prev)
        logp = gaussian_logp(mean, log_std, actions)
        return actions, logp, value, None

    def _value(self, params, obs, h=None):
        prev = jnp.zeros(obs.shape[:-1] + (self.act_dim,))
        _, _, value = self.net.apply(params, obs, prev)
        return value

    @staticmethod
    def _shift_actions(actions):
        """actions (..., A, act) -> teacher-forcing prev-actions input."""
        prev = jnp.zeros_like(actions)
        return prev.at[..., 1:, :].set(actions[..., :-1, :])

    def _loss(self, params, batch):
        cfg = self.cfg
        prev = self._shift_actions(batch["action"])
        mean, log_std, value = self.net.apply(params, batch["obs"], prev)
        logp = gaussian_logp(mean, log_std, batch["action"])
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
        pg_loss = -jnp.minimum(surr1, surr2).mean()
        v_loss = 0.5 * ((value - batch["ret"]) ** 2).mean()
        entropy = (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum()
        loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
        return loss, dict(pg_loss=pg_loss, v_loss=v_loss, entropy=entropy)

    def _update_impl(self, ts: TrainState):
        cfg = self.cfg
        env_state, key, traj, final_value, ep_acc, _ = self._rollout(ts)
        # valuenorm (same scheme as PPOTrainer._update_impl; previously the
        # MAT path silently ignored cfg.use_valuenorm — ADVICE r4)
        if cfg.use_valuenorm:
            traj, final_value = self._valuenorm(ts, traj, final_value)
        advs, returns = self._gae(traj, final_value)
        if cfg.use_valuenorm:
            ret_mean, ret_var, norm = self._valuenorm_update(ts, returns)
            ret_for_loss = norm(returns)
        else:
            ret_mean, ret_var = ts.ret_mean, ts.ret_var
            ret_for_loss = returns
        if cfg.normalize_adv:
            advs = (advs - advs.mean()) / (advs.std() + 1e-8)

        T, E, A = cfg.rollout_len, self.E, self.A
        # keep the agent axis: (T*E, A, ...)
        flat = lambda x: x.reshape((T * E,) + x.shape[2:])
        batch = dict(
            obs=flat(traj["obs"][:, :, : A]),
            action=flat(traj["action"][:, :, : A]),
            logp=flat(traj["logp"][:, :, : A]),
            adv=flat(advs),
            ret=flat(ret_for_loss),
        )
        n = T * E
        mb = n // cfg.num_minibatches

        def epoch(carry, _):
            params, opt_state, key = carry
            key, kperm = jax.random.split(key)
            perm = jax.random.permutation(kperm, n)

            def mb_step(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                sub = jax.tree.map(lambda x: x[idx], batch)
                (loss, _), grads = jax.value_and_grad(self._loss, has_aux=True)(params, sub)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                mb_step, (params, opt_state), jnp.arange(cfg.num_minibatches)
            )
            return (params, opt_state, key), losses.mean()

        (params, opt_state, key), losses = jax.lax.scan(
            epoch, (ts.params, ts.opt_state, key), None, length=cfg.ppo_epochs
        )
        metrics = dict(
            loss=losses.mean(),
            reward_mean=traj["reward"].mean(),
            value_mean=traj["value"].mean(),
            done_frac=traj["done"].mean(),
        )
        ts = ts.replace(
            params=params, opt_state=opt_state, env_state=env_state, key=key,
            update_count=ts.update_count + 1, ep_acc=ep_acc,
            ret_mean=ret_mean, ret_var=ret_var,
        )
        return ts, metrics
