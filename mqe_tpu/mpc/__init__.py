"""Trajectory optimization / MPC over the locomotion command space.

The reference has no planner at all — its only control is RL over velocity
commands (ref openrl_ws/train.py). This package is the BASELINE.json
north-star component: a batched multi-agent iLQR/SQP trajectory optimizer
that plans sequences of walk-policy commands (vx, vy, yaw-rate), vmapped over
thousands of envs and sharded across the device mesh.
"""
from mqe_tpu.mpc.ilqr import ILQRConfig, make_ilqr
from mqe_tpu.mpc.command_model import CommandModel, joint_dynamics, fit_command_model
from mqe_tpu.mpc.controller import CommandMPC

__all__ = [
    "ILQRConfig",
    "make_ilqr",
    "CommandModel",
    "joint_dynamics",
    "fit_command_model",
    "CommandMPC",
]
