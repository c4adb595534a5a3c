"""Training CLI (ref openrl_ws/train.py):

  python -m mqe_tpu.learn.train --task go1gate --algo ppo --num-envs 512 \
      --train-timesteps 40000000 --checkpoint-dir ./checkpoints

Algorithms: ppo, jrpo, dppo, mat (OpenRL menu, ref train.py:25-51).
Checkpoints are .npz pytree snapshots of the FULL TrainState (params,
optimizer state, env state, PRNG key, update count) saved periodically;
`--resume` continues an interrupted run exactly where it left off — unlike the
reference, which saves params once at the end (ref openrl_ws/train.py:68-70).

Logging sinks: JSON lines (stdout and --log-file), optional TensorBoard
(--use-tensorboard, ref train.py:60-65) and wandb (--use-wandb, ref
train.py:52-58; gated on the package being installed). Per-term episode means
(the reference's extras["episode"]) are included in every log record.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="go1gate")
    p.add_argument("--algo", default="ppo", choices=["ppo", "jrpo", "dppo", "mat", "sppo"])
    p.add_argument("--num-envs", type=int, default=None)
    p.add_argument("--train-timesteps", type=int, default=1_000_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=7e-4)
    p.add_argument("--ent-coef", type=float, default=0.0,
                   help="entropy bonus (default matches the reference's ppo.yaml)")
    p.add_argument("--recurrent", action="store_true",
                   help="GRU policy (ref ppo.yaml use_recurrent_policy: true)")
    p.add_argument("--rollout-len", type=int, default=32)
    p.add_argument("--gait", default=None,
                   choices=[None, "trotting", "pacing", "bounding", "pronking"],
                   help="override the task's default-command gait (e.g. "
                        "train seesaw under trotting while the locomotion "
                        "stack's pacing support catches up)")
    p.add_argument("--selfplay", action="store_true",
                   help="competitive tasks: per-seat zero-sum reward for "
                        "shared-policy self-play (default: reference "
                        "agent-0-only reward channel)")
    p.add_argument("--selfplay-punishment", type=float, default=None,
                   help="override the own-fall penalty scale in self-play "
                        "(reference wrestling S=10/P=1 rewards brawling; "
                        "P=S trains defensiveness)")
    p.add_argument("--cmd-warmup", type=int, default=0,
                   help="open the vx command envelope linearly over the "
                        "first N updates (seesaw-style careful-approach "
                        "curriculum); 0 = off")
    p.add_argument("--checkpoint-dir", default="./checkpoints")
    p.add_argument("--checkpoint-every", type=int, default=50,
                   help="save full TrainState every N update calls (0 = end only)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--log-file", default=None)
    p.add_argument("--use-tensorboard", action="store_true")
    p.add_argument("--tb-dir", default="./tb")
    p.add_argument("--use-wandb", action="store_true")
    p.add_argument("--wandb-project", default="mqe_tpu")
    p.add_argument("--resume", default=None,
                   help="checkpoint path: full TrainState resume (params-only "
                        "checkpoints from eval exports also accepted)")
    p.add_argument("--profile-dir", default=None, help="capture a jax profiler trace here")
    p.add_argument("--updates-per-call", type=int, default=1,
                   help="lax.scan N PPO updates per device call (amortizes "
                        "dispatch through remote-execution tunnels)")
    p.add_argument("--split", action="store_true",
                   help="rollout and SGD as two device programs (smaller "
                        "graphs for remote-compile services)")
    p.add_argument("--log-every", type=int, default=10,
                   help="emit a log record every N update calls")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mqe_tpu.envs import make_mqe_env
    from mqe_tpu.learn.ppo import PPOConfig, PPOTrainer

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
    if args.selfplay:
        wrap.selfplay = True  # before first trace (wrappers.TaskWrapper)
        wrap.selfplay_punishment = args.selfplay_punishment
    algo = "ppo" if args.algo == "sppo" else args.algo  # sppo: OpenRL's simple-PPO == shared-param PPO here
    pcfg = PPOConfig(algo=algo, lr=args.lr, rollout_len=args.rollout_len,
                     ent_coef=args.ent_coef,
                     cmd_warmup_updates=args.cmd_warmup,
                     recurrent=args.recurrent and args.algo != "mat")
    if args.algo == "mat":
        from mqe_tpu.learn.mat import MATTrainer

        trainer = MATTrainer(wrap, pcfg, seed=args.seed)
    else:
        trainer = PPOTrainer(wrap, pcfg, seed=args.seed)
    print(
        f"task={args.task} algo={args.algo} envs={trainer.E} agents={trainer.A} "
        f"obs_dim={trainer.obs_dim}",
        flush=True,
    )

    logf = open(args.log_file, "a") if args.log_file else None
    tb = None
    if args.use_tensorboard:
        from torch.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(os.path.join(args.tb_dir, f"{args.task}_{args.algo}"))
    wb = None
    if args.use_wandb:
        try:
            import wandb as wb  # noqa: F811

            wb.init(project=args.wandb_project, config=vars(args))
        except ImportError:
            print("wandb not installed; skipping (JSON/TB sinks still active)", flush=True)
            wb = None

    def cb(m):
        line = json.dumps({"task": args.task, "algo": args.algo, **m})
        print(line, flush=True)
        if logf:
            logf.write(line + "\n")
            logf.flush()
        if tb is not None:
            step = m.get("env_steps", 0)
            for k, v in m.items():
                if isinstance(v, (int, float)) and k != "env_steps":
                    tb.add_scalar(k, v, step)
        if wb is not None:
            wb.log(m)

    os.makedirs(args.checkpoint_dir, exist_ok=True)
    ckpt_path = os.path.abspath(
        os.path.join(args.checkpoint_dir, f"{args.task}_{args.algo}")
    )

    resume_state = None
    if args.resume:
        try:
            resume_state = trainer.restore_checkpoint(args.resume)
            print(f"resumed full TrainState from {args.resume} "
                  f"(update {int(resume_state.update_count)})", flush=True)
        except Exception as e:  # params-only checkpoint (eval export)
            import orbax.checkpoint as ocp

            restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.resume))
            trainer.init_params = restored["params"]
            print(f"resumed params only from {args.resume} ({e.__class__.__name__})",
                  flush=True)

    t0 = time.time()
    kwargs = dict(
        callback=cb,
        resume_state=resume_state,
        checkpoint_path=ckpt_path,
        checkpoint_every=args.checkpoint_every,
        updates_per_call=args.updates_per_call,
        split=args.split,
        log_every=args.log_every,
    )
    if args.profile_dir:
        from mqe_tpu.utils.metrics import profile_trace

        with profile_trace(args.profile_dir):
            ts, history = trainer.train(args.train_timesteps, **kwargs)
    else:
        ts, history = trainer.train(args.train_timesteps, **kwargs)
    wall = time.time() - t0
    print(f"trained {args.train_timesteps} env steps in {wall:.0f}s "
          f"({args.train_timesteps / wall:.0f} steps/s)", flush=True)
    print(f"saved checkpoint to {ckpt_path}", flush=True)
    if tb is not None:
        tb.close()


if __name__ == "__main__":
    main()
