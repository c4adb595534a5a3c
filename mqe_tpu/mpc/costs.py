"""Task cost functions for command-space trajectory optimization.

Costs operate on the joint multi-agent planner state (A*6,) and joint
control (A*3,). `args` carries per-env data (targets, gate position from the
terrain env_info oracle — the same oracle the task wrappers feed to RL,
ref barrier_track.py:356-358 -> wrapper obs).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class CostWeights:
    w_pos: float = 2.0        # squared distance to target waypoint
    w_vel: float = 0.05       # velocity magnitude (settle at the target)
    w_u: float = 0.02         # control effort
    w_du: float = 0.0         # (reserved) control rate
    w_sep: float = 4.0        # inter-agent separation hinge
    d_min: float = 0.7        # minimum inter-agent distance (m)
    w_heading: float = 0.1    # face the target while far from it
    terminal_scale: float = 10.0


def _split(x, A):
    xa = x.reshape(A, 6)
    return xa[:, 0:2], xa[:, 2], xa[:, 3:5], xa[:, 5]


# per-channel control effort: lateral and yaw commands cost more than forward
# (the gait tracks vx best; saturated vy/yaw commands destabilize the trot)
_U_CHAN = jnp.array([1.0, 3.0, 2.0])


def _u_cost(u, A, w: CostWeights):
    ua = u.reshape(A, 3)
    return w.w_u * (_U_CHAN[None, :] * ua**2).sum()


def _separation_penalty(pos, A, w: CostWeights):
    if A < 2:
        return 0.0
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    off = ~jnp.eye(A, dtype=bool)
    # smooth hinge: penalize closer than d_min
    gap = jnp.maximum(w.d_min**2 - d2, 0.0)
    return 0.5 * w.w_sep * (gap * off).sum()


def waypoint_cost(A: int, w: CostWeights = CostWeights()):
    """Per-agent waypoint tracking. args = targets (A, 2) in env-local xy."""

    def stage(x, u, t, args):
        pos, yaw, vel, wz = _split(x, A)
        tgt = args["targets"]
        e = pos - tgt
        c = w.w_pos * (e**2).sum()
        c = c + w.w_vel * ((vel**2).sum() + (wz**2).sum())
        c = c + _u_cost(u, A, w)
        # heading alignment: cos distance between yaw and direction-to-target
        to_t = tgt - pos
        dist = jnp.sqrt((to_t**2).sum(-1) + 1e-6)
        hd = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
        align = (hd * to_t).sum(-1) / dist
        c = c + w.w_heading * ((1.0 - align) * jnp.minimum(dist, 2.0)).sum()
        c = c + _separation_penalty(pos, A, w)
        return c

    def final(x, args):
        pos, yaw, vel, wz = _split(x, A)
        e = pos - args["targets"]
        return w.terminal_scale * (
            w.w_pos * (e**2).sum() + w.w_vel * ((vel**2).sum() + (wz**2).sum())
        )

    return stage, final


def gate_cost(A: int, w: CostWeights = CostWeights()):
    """go1gate: both agents pass through the gate opening then keep going.

    args = {"gate": (2,) gate center xy in env-local coords, "goal_x": ()}.

    Smooth corridor formulation: quadratic progress toward goal_x in x, plus
    a Gaussian-weighted lateral alignment to the gate's y (the oracle
    gate_deviation) that activates near the gate plane. A hard "target
    switches after crossing" cost would make crossing locally COST-INCREASING
    (the new target jumps ahead) and the optimizer would park at the plane —
    the corridor form is monotone in progress, so iLQR drives straight
    through. Separation hinge is softened (agents must queue through a
    ~1 m opening).
    """
    w = CostWeights(
        w_pos=w.w_pos, w_vel=w.w_vel, w_u=w.w_u, w_du=w.w_du,
        w_sep=min(w.w_sep, 2.0), d_min=min(w.d_min, 0.45),
        w_heading=w.w_heading, terminal_scale=w.terminal_scale,
    )
    W_GATE_Y = 3.0     # lateral alignment strength at the gate plane
    GATE_SIGMA = 0.7   # (m) how far from the plane alignment starts to bind
    W_PROG = 0.25      # progress-to-goal weight (x only)

    def _lateral(pos, args):
        gate = args["gate"]
        near = jnp.exp(-((pos[:, 0] - gate[0]) / GATE_SIGMA) ** 2)
        return ((W_GATE_Y * near + 0.02) * (pos[:, 1] - gate[1]) ** 2).sum()

    def stage(x, u, t, args):
        pos, yaw, vel, wz = _split(x, A)
        goal_x = args["goal_x"]
        c = W_PROG * ((pos[:, 0] - goal_x) ** 2).sum()
        c = c + _lateral(pos, args)
        c = c + _u_cost(u, A, w)
        c = c + 0.02 * (wz**2).sum()
        c = c + _separation_penalty(pos, A, w)
        return c

    def final(x, args):
        pos, yaw, vel, wz = _split(x, A)
        goal_x = args["goal_x"]
        return w.terminal_scale * (
            W_PROG * ((pos[:, 0] - goal_x) ** 2).sum() + _lateral(pos, args)
        )

    return stage, final


def pushbox_cost(A: int, w: CostWeights = CostWeights()):
    """go1pushbox: drive agents to a shoving pose behind the box.

    args = {"box": (2,) box xy, "push_dir": (2,) unit direction to push}.
    Stance point = box - 0.6 * push_dir, with small per-agent lateral offsets
    so two agents don't fight for the same spot.
    """

    def stage(x, u, t, args):
        pos, yaw, vel, wz = _split(x, A)
        box = args["box"]
        d = args["push_dir"]
        lat = jnp.stack([-d[1], d[0]])
        offs = (jnp.arange(A) - (A - 1) / 2.0)[:, None] * 0.5 * lat[None]
        tgt = box[None] - 0.6 * d[None] + offs
        e = pos - tgt
        c = w.w_pos * (e**2).sum() + _u_cost(u, A, w)
        c = c + _separation_penalty(pos, A, w)
        return c

    def final(x, args):
        pos, yaw, vel, wz = _split(x, A)
        box = args["box"]
        d = args["push_dir"]
        lat = jnp.stack([-d[1], d[0]])
        offs = (jnp.arange(A) - (A - 1) / 2.0)[:, None] * 0.5 * lat[None]
        tgt = box[None] - 0.6 * d[None] + offs
        return w.terminal_scale * w.w_pos * ((pos - tgt) ** 2).sum()

    return stage, final
