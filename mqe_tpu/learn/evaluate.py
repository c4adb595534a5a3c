"""Policy evaluation CLI (ref openrl_ws/test.py:48-99): load a checkpoint,
roll out, report per-episode returns; optionally record a video.

  python -m mqe_tpu.learn.evaluate --task go1gate \
      --checkpoint ./checkpoints/go1gate_ppo --episodes 5 --video out.gif
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="go1gate")
    p.add_argument("--checkpoint", required=False, default=None)
    p.add_argument("--num-envs", type=int, default=4)
    p.add_argument("--episodes", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--video", default=None, help="output GIF path (env 0)")
    p.add_argument("--json", default=None,
                   help="append one JSON record of the eval result here")
    p.add_argument("--recurrent", action="store_true",
                   help="checkpoint was trained with --recurrent (GRU policy)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--gait", default=None,
                   choices=[None, "trotting", "pacing", "bounding", "pronking"],
                   help="override the task's default-command gait (must match "
                        "the gait the checkpoint was trained under)")
    p.add_argument("--stochastic", action="store_true",
                   help="sample actions from the policy distribution instead "
                        "of acting on the mean (matches the training-rollout "
                        "behavior; used to reconcile train-window vs eval "
                        "success rates)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mqe_tpu.envs import make_mqe_env
    from mqe_tpu.learn.networks import ActorCritic

    custom_cfg = None
    if args.gait:
        def custom_cfg(cfg, _g=args.gait):
            class Cfg(cfg):
                class control(cfg.control):
                    class default_command(cfg.control.default_command):
                        pass
            Cfg.control.default_command.gait = _g
            return Cfg

    wrap, cfg = make_mqe_env(args.task, num_envs=args.num_envs, seed=args.seed,
                             custom_cfg=custom_cfg)
    A = getattr(wrap, "controlled_agents", wrap.num_agents)
    if args.recurrent:
        from mqe_tpu.learn.networks import RecurrentActorCritic

        net = RecurrentActorCritic(action_dim=wrap.action_dim)
    else:
        net = ActorCritic(action_dim=wrap.action_dim)
    h = net.initial_state((args.num_envs, A)) if args.recurrent else None

    params = None
    if args.checkpoint:
        import os

        if os.path.isdir(args.checkpoint):  # legacy orbax params-only dir
            import orbax.checkpoint as ocp

            params = ocp.PyTreeCheckpointer().restore(args.checkpoint)["params"]
        else:  # full-TrainState .npz snapshot (utils/checkpoint.py)
            from mqe_tpu.learn.ppo import PPOConfig, PPOTrainer
            from mqe_tpu.utils.checkpoint import restore_pytree

            tr = PPOTrainer(
                wrap, PPOConfig(recurrent=args.recurrent), seed=args.seed
            )
            params = restore_pytree(args.checkpoint, tr.init_state()).params
        print(f"loaded checkpoint {args.checkpoint}")

    key = jax.random.PRNGKey(args.seed)
    ts, obs = wrap.reset(key)

    @jax.jit
    def act(params, obs, h, k):
        if args.recurrent:
            mean, log_std, value, h = net.apply(params, obs, h)
        else:
            mean, log_std, value = net.apply(params, obs)
        if args.stochastic:
            mean = mean + jnp.exp(log_std) * jax.random.normal(k, mean.shape)
        return wrap.rl_prescale(mean), h

    frames = []
    renderer = None
    if args.video:
        from mqe_tpu.render.topdown import TopDownRenderer

        renderer = TopDownRenderer(wrap.env)

    ep_returns = np.zeros((args.num_envs,))
    finished_returns = []
    finished_succ = []
    max_steps = args.episodes * wrap.env.max_episode_length
    for i in range(max_steps):
        key, k, k_act = jax.random.split(key, 3)
        if params is not None:
            actions, h = act(params, obs, h, k_act)
        else:
            actions = jnp.zeros((args.num_envs, A, 3)).at[..., 0].set(0.5)
        ts, obs, rew, done, info = wrap.step(ts, actions, k)
        ep_returns += np.asarray(rew).mean(axis=-1)
        d = np.asarray(done)
        if args.recurrent and d.any():  # fresh memory for new episodes
            h = jnp.where(jnp.asarray(d)[:, None, None], 0.0, h)
        if d.any():
            finished_returns.extend(ep_returns[d].tolist())
            ep_returns[d] = 0.0
            if "ep_success" in info:  # per-episode task success flag
                finished_succ.extend(np.asarray(info["ep_success"])[d].tolist())
        if renderer is not None and i % 2 == 0:
            frames.append(renderer.render(ts.env, env_idx=0))
        if len(finished_returns) >= args.episodes * args.num_envs:
            break

    succ_str = (
        f" success_rate={np.mean(finished_succ):.3f}" if finished_succ else ""
    )
    mean_ret = (
        float(np.mean(finished_returns)) if finished_returns
        else float(np.mean(ep_returns))
    )
    print(f"episodes={len(finished_returns)} mean_return={mean_ret:.3f}" + succ_str)
    if args.json:
        import json

        rec = {
            "task": args.task,
            "checkpoint": args.checkpoint,
            "episodes": len(finished_returns),
            "mean_return": round(mean_ret, 4),
            "seed": args.seed,
            "mode": "stochastic" if args.stochastic else "deterministic",
        }
        if finished_succ:
            rec["success_rate"] = round(float(np.mean(finished_succ)), 5)
        with open(args.json, "a") as f:
            f.write(json.dumps(rec) + "\n")
    if renderer is not None and frames:
        renderer.save_gif(frames, args.video)
        print(f"wrote {args.video} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
