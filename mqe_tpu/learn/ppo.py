"""PPO-family training (ppo / jrpo / dppo) for the task wrappers, pure JAX.

In-framework replacement for the reference's OpenRL integration
(ref openrl_ws/train.py:10-74, cfgs/*.yaml): same hyperparameter defaults
(lr 7e-4, episode_length 200, value+advantage normalization), same algo menu:

  ppo  — independent PPO with shared parameters across agents
  jrpo — joint-reward variant: agents optimize the team-mean reward
         (OpenRL's JRPO joint-action loss approximated at the reward level)
  dppo — dual-clip PPO (lower clip c=3)

The whole train step — rollout (lax.scan over env.step), GAE, minibatched
epochs — is one jit; nothing leaves the device except logging scalars.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from mqe_tpu.learn.networks import ActorCritic, gaussian_logp
from mqe_tpu.utils.metrics import EpisodeAccumulator


@dataclass(frozen=True)
class PPOConfig:
    algo: str = "ppo"              # ppo | jrpo | dppo
    recurrent: bool = False        # GRU policy (ref ppo.yaml use_recurrent_policy)
    lr: float = 7e-4
    rollout_len: int = 32
    num_minibatches: int = 4
    ppo_epochs: int = 4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    dual_clip: float = 3.0
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5
    normalize_adv: bool = True
    # running return normalization for the critic (ref ppo.yaml
    # use_valuenorm: true): the critic regresses normalized returns and its
    # outputs are denormalized for GAE — stabilizes tasks mixing sparse
    # success rewards (5-10) with small dense shaping
    use_valuenorm: bool = True
    valuenorm_beta: float = 0.995
    # command-envelope warmup: linearly open the forward-speed (vx) command
    # from cmd_warmup_floor to 1.0 over the first N updates. Motivated by
    # the go1seesaw r4 negative result: with the full +/-2 m/s envelope from
    # step one, the x-movement reward drives a sprint into the seesaw ramp,
    # the robot flips and terminates before any approach gradient can form
    # (BENCHLOG r4). 0 = off.
    cmd_warmup_updates: int = 0
    cmd_warmup_floor: float = 0.3


@struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    env_state: object            # TaskState
    key: jnp.ndarray
    update_count: jnp.ndarray
    ret_mean: jnp.ndarray        # running return normalization (valuenorm-lite)
    ret_var: jnp.ndarray
    ep_acc: EpisodeAccumulator   # extras["episode"]-style per-term episode means
    rnn_h: object = None         # (E, A, H) GRU carry when recurrent, else None


class PPOTrainer:
    def __init__(self, wrapper, config: PPOConfig = PPOConfig(), seed: int = 0):
        self.w = wrapper
        self.cfg = config
        self.E = wrapper.num_envs
        self.A = getattr(wrapper, "controlled_agents", wrapper.num_agents)
        self.obs_dim = wrapper.obs_dim
        self.act_dim = wrapper.action_dim
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        if config.recurrent:
            from mqe_tpu.learn.networks import RecurrentActorCritic

            self.net = RecurrentActorCritic(action_dim=self.act_dim)
            self.init_params = self.net.init(
                k1, jnp.zeros((1, self.obs_dim)), self.net.initial_state((1,))
            )
        else:
            self.net = ActorCritic(action_dim=self.act_dim)
            self.init_params = self.net.init(k1, jnp.zeros((1, self.obs_dim)))
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(config.lr, eps=1e-5),
        )
        self._update = jax.jit(self._update_impl, donate_argnums=(0,))
        self._init_key = k2
        self.term_names = self._discover_term_names()
        # split-phase mode: rollout and SGD as two smaller device programs
        # (remote-compile services can choke on the fused env+autodiff graph)
        self._rollout_jit = None
        self._sgd_jit = None

    def _discover_term_names(self):
        """Discover the wrapper's static reward-term key set by abstract trace
        (term names are per-task constants; no compute happens here)."""
        try:
            ts_s, _ = jax.eval_shape(self.w._reset_impl, jax.random.PRNGKey(0))
            act_s = jax.ShapeDtypeStruct((self.E, self.A, self.act_dim), jnp.float32)
            out = jax.eval_shape(
                lambda t, a, k: self.w._step_impl(t, self.w.rl_prescale(a), k),
                ts_s, act_s, jax.random.PRNGKey(0),
            )
            return tuple(sorted(out[4]["reward_terms"].keys()))
        except Exception:
            return ()

    def init_state(self) -> TrainState:
        key, k = jax.random.split(self._init_key)
        env_state, _ = self.w.reset(k)
        return TrainState(
            params=self.init_params,
            opt_state=self.tx.init(self.init_params),
            env_state=env_state,
            key=key,
            update_count=jnp.zeros((), jnp.int32),
            ret_mean=jnp.zeros(()),
            ret_var=jnp.ones(()),
            ep_acc=EpisodeAccumulator.create(
                self.E, self.term_names,
                track_success=getattr(self.w, "has_success", False),
            ),
            rnn_h=(
                self.net.initial_state((self.E, self.A))
                if self.cfg.recurrent else None
            ),
        )

    # ------------------------------------------------------------------
    def _policy(self, params, obs, key, h=None):
        if self.cfg.recurrent:
            mean, log_std, value, h = self.net.apply(params, obs, h)
        else:
            mean, log_std, value = self.net.apply(params, obs)
        noise = jax.random.normal(key, mean.shape)
        action = mean + jnp.exp(log_std) * noise
        logp = gaussian_logp(mean, log_std, action)
        return action, logp, value, h

    def _rollout(self, ts: TrainState):
        cfg = self.cfg
        if cfg.cmd_warmup_updates > 0:
            warm = jnp.clip(
                ts.update_count / cfg.cmd_warmup_updates,
                cfg.cmd_warmup_floor, 1.0,
            )
        else:
            warm = None

        def step(carry, _):
            env_state, key, acc, h = carry
            key, k_act, k_env = jax.random.split(key, 3)
            obs = self.w.observe(env_state)
            action, logp, value, h_next = self._policy(ts.params, obs, k_act, h)
            cmd = self.w.rl_prescale(action)
            if warm is not None:
                cmd = cmd.at[..., 0].multiply(warm)
            env_state, next_obs, reward, done, info = self.w._step_impl(
                env_state, cmd, k_env
            )
            acc = acc.update(
                reward[:, : self.A].mean(-1), done, info.get("reward_terms"),
                success=info.get("ep_success"),
            )
            if cfg.algo == "jrpo":
                reward = reward.mean(axis=-1, keepdims=True).repeat(reward.shape[-1], -1)
            trans = dict(
                obs=obs, action=action, logp=logp, value=value,
                reward=reward[:, : self.A], done=done,
            )
            if cfg.recurrent:
                trans["h"] = h  # pre-step state, aligned with obs
                # episode boundary: new episodes start with a fresh memory
                h_next = jnp.where(done[:, None, None], 0.0, h_next)
            return (env_state, key, acc, h_next), trans

        (env_state, key, ep_acc, rnn_h), traj = jax.lax.scan(
            step, (ts.env_state, ts.key, ts.ep_acc, ts.rnn_h), None,
            length=cfg.rollout_len,
        )
        final_obs = self.w.observe(env_state)
        final_value = self._value(ts.params, final_obs, rnn_h)
        return env_state, key, traj, final_value, ep_acc, rnn_h

    def _value(self, params, obs, h=None):
        if self.cfg.recurrent:
            _, _, value, _ = self.net.apply(params, obs, h)
        else:
            _, _, value = self.net.apply(params, obs)
        return value

    def _gae(self, traj, final_value):
        cfg = self.cfg

        def scan_fn(carry, t):
            gae, next_value = carry
            notdone = 1.0 - t["done"][:, None].astype(jnp.float32)
            delta = t["reward"] + cfg.gamma * next_value * notdone - t["value"]
            gae = delta + cfg.gamma * cfg.gae_lambda * notdone * gae
            return (gae, t["value"]), gae

        (gae_final, _), advs = jax.lax.scan(
            scan_fn,
            (jnp.zeros_like(final_value), final_value),
            traj,
            reverse=True,
        )
        returns = advs + traj["value"]
        return advs, returns

    def _loss(self, params, batch):
        cfg = self.cfg
        if cfg.recurrent:
            # stored-state scheme: replay each step from its recorded hidden
            mean, log_std, value, _ = self.net.apply(
                params, batch["obs"], batch["h"]
            )
        else:
            mean, log_std, value = self.net.apply(params, batch["obs"])
        logp = gaussian_logp(mean, log_std, batch["action"])
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
        pg = jnp.minimum(surr1, surr2)
        if cfg.algo == "dppo":
            # dual-clip: bound how negative the objective can get for adv<0
            pg = jnp.where(adv < 0, jnp.maximum(pg, cfg.dual_clip * adv), pg)
        pg_loss = -pg.mean()
        v_loss = 0.5 * ((value - batch["ret"]) ** 2).mean()
        entropy = (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum()
        loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
        return loss, dict(pg_loss=pg_loss, v_loss=v_loss, entropy=entropy)

    def _valuenorm(self, ts, traj, final_value):
        """Critic outputs are normalized-return predictions; denormalize them
        with the running stats before GAE (ref ppo.yaml use_valuenorm)."""
        std = jnp.sqrt(ts.ret_var + 1e-8)
        traj = dict(traj)
        traj["value"] = traj["value"] * std + ts.ret_mean
        final_value = final_value * std + ts.ret_mean
        return traj, final_value

    def _valuenorm_update(self, ts, returns):
        """EMA-refresh the return stats; returns (mean, var, normalizer)."""
        b = self.cfg.valuenorm_beta
        new_mean = b * ts.ret_mean + (1 - b) * returns.mean()
        new_var = b * ts.ret_var + (1 - b) * returns.var()
        norm = lambda r: (r - new_mean) / jnp.sqrt(new_var + 1e-8)
        return new_mean, new_var, norm

    def _update_impl(self, ts: TrainState):
        cfg = self.cfg
        env_state, key, traj, final_value, ep_acc, rnn_h = self._rollout(ts)
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
        flat = lambda x: x.reshape((T * E * A,) + x.shape[3:])
        batch = dict(
            obs=flat(traj["obs"][:, :, : self.A]),
            action=flat(traj["action"][:, :, : self.A]),
            logp=flat(traj["logp"][:, :, : self.A]),
            adv=flat(advs),
            ret=flat(ret_for_loss),
        )
        if cfg.recurrent:
            batch["h"] = flat(traj["h"][:, :, : self.A])
        n = T * E * A
        mb = n // cfg.num_minibatches

        def epoch(carry, _):
            params, opt_state, key = carry
            key, kperm = jax.random.split(key)
            perm = jax.random.permutation(kperm, n)

            def mb_step(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                sub = jax.tree.map(lambda x: x[idx], batch)
                (loss, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(params, sub)
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
            update_count=ts.update_count + 1, ep_acc=ep_acc, rnn_h=rnn_h,
            ret_mean=ret_mean, ret_var=ret_var,
        )
        return ts, metrics

    def update(self, ts: TrainState):
        return self._update(ts)

    # ---- split-phase path ----
    def _rollout_fn(self, params, env_state, key, ep_acc, rnn_h=None,
                    ret_mean=0.0, ret_var=1.0):
        class _TS:  # lightweight view for _rollout's ts.{params,env_state,key,...}
            pass

        view = _TS()
        view.params = params
        view.env_state = env_state
        view.key = key
        view.ep_acc = ep_acc
        view.rnn_h = rnn_h
        view.ret_mean = ret_mean
        view.ret_var = ret_var
        env_state, key, traj, final_value, ep_acc, rnn_h = self._rollout(view)
        if self.cfg.use_valuenorm:
            traj, final_value = self._valuenorm(view, traj, final_value)
        advs, returns = self._gae(traj, final_value)
        if self.cfg.use_valuenorm:
            ret_mean, ret_var, norm = self._valuenorm_update(view, returns)
            returns = norm(returns)
        if self.cfg.normalize_adv:
            advs = (advs - advs.mean()) / (advs.std() + 1e-8)
        return env_state, key, traj, advs, returns, ep_acc, rnn_h, ret_mean, ret_var

    def _sgd_fn(self, params, opt_state, batch, key):
        cfg = self.cfg
        n = batch["adv"].shape[0]
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
            epoch, (params, opt_state, key), None, length=cfg.ppo_epochs
        )
        return params, opt_state, losses.mean()

    def update_split(self, ts: TrainState):
        """One PPO update as two device programs (rollout / SGD)."""
        if self._rollout_jit is None:
            self._rollout_jit = jax.jit(self._rollout_fn)
            self._sgd_jit = jax.jit(self._sgd_fn, donate_argnums=(0, 1))
        (env_state, key, traj, advs, returns, ep_acc, rnn_h,
         ret_mean, ret_var) = self._rollout_jit(
            ts.params, ts.env_state, ts.key, ts.ep_acc, ts.rnn_h,
            ts.ret_mean, ts.ret_var,
        )
        T, E, A = self.cfg.rollout_len, self.E, self.A
        flat = lambda x: x.reshape((T * E * A,) + x.shape[3:])
        batch = dict(
            obs=flat(traj["obs"][:, :, : A]),
            action=flat(traj["action"][:, :, : A]),
            logp=flat(traj["logp"][:, :, : A]),
            adv=flat(advs),
            ret=flat(returns),
        )
        if self.cfg.recurrent:
            batch["h"] = flat(traj["h"][:, :, : A])
        key, k = jax.random.split(key)
        params, opt_state, loss = self._sgd_jit(ts.params, ts.opt_state, batch, k)
        metrics = dict(
            loss=loss,
            reward_mean=traj["reward"].mean(),
            value_mean=traj["value"].mean(),
            done_frac=traj["done"].mean(),
        )
        return ts.replace(
            params=params, opt_state=opt_state, env_state=env_state, key=key,
            update_count=ts.update_count + 1, ep_acc=ep_acc, rnn_h=rnn_h,
            ret_mean=ret_mean, ret_var=ret_var,
        ), metrics

    def update_many(self, ts: TrainState, n: int):
        """n PPO updates in ONE device program (lax.scan over the update);
        amortizes per-call dispatch, which dominates through remote-execution
        tunnels. Metrics are averaged over the chunk."""
        if not hasattr(self, "_update_many") or self._update_many_n != n:
            def chunk(ts):
                def body(t, _):
                    t, m = self._update_impl(t)
                    return t, m

                ts, ms = jax.lax.scan(body, ts, None, length=n)
                return ts, jax.tree.map(lambda x: x.mean(), ms)

            self._update_many = jax.jit(chunk, donate_argnums=(0,))
            self._update_many_n = n
        return self._update_many(ts)

    # ---- full checkpoint/resume (params + opt state + env state + key +
    # counters; VERDICT r1 #6 — the reference loses everything between
    # agent.save calls, ref openrl_ws/train.py:68-70) ----
    def save_checkpoint(self, ts: TrainState, path: str):
        from mqe_tpu.utils.checkpoint import save_pytree

        return save_pytree(path, ts)

    def restore_checkpoint(self, path: str) -> TrainState:
        from mqe_tpu.utils.checkpoint import restore_pytree

        return restore_pytree(path, self.init_state())

    def train(self, total_env_steps: int, log_every: int = 10, callback=None,
              updates_per_call: int = 1, split: bool = False,
              resume_state: TrainState | None = None,
              checkpoint_path: str | None = None, checkpoint_every: int = 0):
        ts = resume_state if resume_state is not None else self.init_state()
        steps_per_update = self.cfg.rollout_len * self.E * self.A
        n_updates = max(1, total_env_steps // steps_per_update)
        history = []
        i = int(ts.update_count)
        calls = 0
        while i < n_updates:
            if split:
                ts, metrics = self.update_split(ts)
                i += 1
            elif updates_per_call > 1:
                k = min(updates_per_call, n_updates - i)
                ts, metrics = self.update_many(ts, k)
                i += k
            else:
                ts, metrics = self.update(ts)
                i += 1
            calls += 1
            if checkpoint_every and checkpoint_path and calls % checkpoint_every == 0:
                self.save_checkpoint(ts, checkpoint_path)
            if calls % log_every == 0 or i >= n_updates:
                m = {k_: float(v) for k_, v in metrics.items()}
                m["update"] = i
                m["env_steps"] = i * steps_per_update
                # per-term episode means over the episodes completed this
                # window (ref extras["episode"], legged_robot.py:1063-1076)
                m.update(ts.ep_acc.summarize())
                ts = ts.replace(ep_acc=ts.ep_acc.reset_window())
                # best-by-episode-return snapshot: PPO can collapse after its
                # peak (observed on go1gate round 4); periodic checkpoints
                # overwrite with the collapsed policy, the _best one doesn't
                if checkpoint_path and m.get("episodes", 0) > 0 and (
                    m["mean_episode_return"] > getattr(self, "_best_ret", -np.inf)
                ):
                    self._best_ret = m["mean_episode_return"]
                    self.save_checkpoint(ts, checkpoint_path + "_best")
                # best-by-window-success snapshot: return and success can
                # peak at different updates (round-5 forensics: the r4
                # best-return gate checkpoint evals at 41% while the success
                # window peaked at 70% — the policy decayed between peak and
                # save; selecting on success directly narrows that loss)
                if checkpoint_path and m.get("episodes", 0) > 0 and (
                    m.get("success_rate") is not None
                    and m["success_rate"] > getattr(self, "_best_succ", -1.0)
                ):
                    self._best_succ = m["success_rate"]
                    self.save_checkpoint(ts, checkpoint_path + "_bestsucc")
                history.append(m)
                if callback:
                    callback(m)
                else:
                    print(
                        f"update {i}/{n_updates} steps={m['env_steps']} "
                        f"reward={m['reward_mean']:.4f} loss={m['loss']:.4f} "
                        f"done_frac={m['done_frac']:.3f}",
                        flush=True,
                    )
        if checkpoint_path:
            self.save_checkpoint(ts, checkpoint_path)
        return ts, history
