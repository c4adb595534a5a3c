"""Probe: training-window success_rate of a FROZEN policy.

Round-5 forensics for VERDICT r4 weak #3 (62.2% train-window vs 34.1% eval
success on go1gate): replays the exact training-side measurement machinery
(PPOTrainer._rollout + EpisodeAccumulator, stochastic policy, identical env
build) with ZERO learning, on a committed checkpoint. If this reads ~eval,
the r4 window number described a transient policy mix, not the committed
artifact; if it reads ~62%, the train metric itself is inflated and has a
bug to find.

Usage: python tools/probe_train_metric.py --checkpoint checkpoints/rec/go1gate_ppo_best.npz \
          --task go1gate --num-envs 2048 --rollouts 100 --recurrent
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="go1gate")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num-envs", type=int, default=2048)
    p.add_argument("--rollouts", type=int, default=100)
    p.add_argument("--recurrent", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mqe_tpu.envs import make_mqe_env
    from mqe_tpu.learn.ppo import PPOConfig, PPOTrainer
    from mqe_tpu.utils.checkpoint import restore_pytree

    wrap, _ = make_mqe_env(args.task, num_envs=args.num_envs, seed=args.seed)
    tr = PPOTrainer(wrap, PPOConfig(recurrent=args.recurrent), seed=args.seed)
    ts = restore_pytree(args.checkpoint, tr.init_state())
    ts = ts.replace(ep_acc=ts.ep_acc.reset_window())

    @jax.jit
    def roll(ts):
        env_state, key, traj, fv, ep_acc, rnn_h = tr._rollout(ts)
        return ts.replace(
            env_state=env_state, key=key, ep_acc=ep_acc, rnn_h=rnn_h
        )

    for i in range(args.rollouts):
        ts = roll(ts)
        if (i + 1) % 20 == 0:
            s = ts.ep_acc.summarize()
            print(
                f"rollout {i+1}: episodes={s['episodes']:.0f} "
                f"return={s['mean_episode_return']:.1f} "
                f"len={s['mean_episode_length']:.1f} "
                f"success={s.get('success_rate', float('nan')):.4f}"
            )
    print("FINAL", ts.ep_acc.summarize())


if __name__ == "__main__":
    main()
