"""Policy/value networks for PPO-family training (flax.linen MLPs).

Replaces the reference's external OpenRL nets (ref openrl_ws/train.py:25-51)
with in-framework JAX modules sized for the MXU (batched matmuls, bf16-ready).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    features: Sequence[int]
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        act = {"elu": nn.elu, "tanh": nn.tanh, "relu": nn.relu}[self.activation]
        for i, f in enumerate(self.features):
            x = nn.Dense(f, kernel_init=nn.initializers.orthogonal(jnp.sqrt(2.0)))(x)
            if i < len(self.features) - 1:
                x = act(x)
        return x


class ActorCritic(nn.Module):
    """Shared-parameter actor-critic over per-agent observations."""

    action_dim: int
    hidden: Sequence[int] = (256, 128, 64)

    @nn.compact
    def __call__(self, obs):
        mean = MLP((*self.hidden, self.action_dim), name="actor")(obs)
        value = MLP((*self.hidden, 1), name="critic")(obs)[..., 0]
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.action_dim,)
        )
        return mean, log_std, value


class RecurrentActorCritic(nn.Module):
    """GRU actor-critic: the reference's canonical recipes train with
    OpenRL's `use_recurrent_policy: true` (ref openrl_ws/cfgs/ppo.yaml) —
    task policies get memory over teammate/NPC intent. Call with the
    previous hidden state; returns the next one. PPO trains it with the
    stored-state scheme (hidden states recorded during rollout, one-step
    gradients — no BPTT through the buffer; OpenRL's data_chunk_length
    default behaves comparably)."""

    action_dim: int
    embed: Sequence[int] = (256,)
    rnn_size: int = 128
    head: Sequence[int] = (64,)

    @nn.compact
    def __call__(self, obs, h):
        x = MLP(self.embed, name="embed")(obs)
        x = nn.elu(x)
        h_new, x = nn.GRUCell(features=self.rnn_size, name="gru")(h, x)
        mean = MLP((*self.head, self.action_dim), name="actor")(x)
        value = MLP((*self.head, 1), name="critic")(x)[..., 0]
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.action_dim,)
        )
        return mean, log_std, value, h_new

    def initial_state(self, batch_shape):
        return jnp.zeros(tuple(batch_shape) + (self.rnn_size,))


def gaussian_logp(mean, log_std, action):
    var = jnp.exp(2 * log_std)
    return (-0.5 * ((action - mean) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi))).sum(-1)
