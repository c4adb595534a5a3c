"""Batched iterative LQR (iLQR/DDP) — TPU-native trajectory optimizer core.

No counterpart in the reference (its control is pure RL over commands,
ref openrl_ws/train.py); this implements the BASELINE.json north-star
"batched multi-agent SQP/iLQR trajectory optimizer".

TPU design notes:
- Every shape is static: fixed horizon, fixed iteration count, fixed
  line-search grid. The whole solve is one `lax.scan` nest — no
  data-dependent Python control flow, so `vmap(solve)` over thousands of
  envs compiles to one fused program.
- Line search is PARALLEL: all step sizes are rolled out simultaneously
  via `vmap` (a serial backtracking loop would leave the chip idle; on TPU
  the extra rollouts are nearly free because they batch).
- Linearization uses `jax.jacfwd`/`jax.hessian` vmapped over the horizon —
  XLA fuses the per-knot Jacobians into batched matmuls on the MXU.
- The backward Riccati recursion is an inherently sequential scan over the
  horizon, but each step is tiny dense linear algebra (n<=24, m<=12 for
  4 agents) solved via Cholesky; the env batch dimension keeps the MXU fed.
- Box control limits are handled by clamped forward rollouts plus a
  projected-Newton-free regularized backward pass (the standard practical
  iLQR treatment; exactness at the bounds is traded for jit stability).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ILQRConfig:
    horizon: int = 20
    n_iters: int = 10
    reg_init: float = 1e-2
    reg_min: float = 1e-6
    reg_max: float = 1e4
    # parallel line-search step sizes (all evaluated at once)
    alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)
    # box control limits; scalar or per-channel tuple of length m
    u_min: float | tuple | None = -1.0
    u_max: float | tuple | None = 1.0


class ILQRSolution(NamedTuple):
    xs: jnp.ndarray       # (H+1, n) optimized state trajectory
    us: jnp.ndarray       # (H, m) optimized controls
    cost: jnp.ndarray     # () final total cost
    cost_trace: jnp.ndarray  # (n_iters,) cost after each iteration


def _clamp(u, cfg: ILQRConfig):
    if cfg.u_min is None and cfg.u_max is None:
        return u
    lo = jnp.asarray(cfg.u_min) if cfg.u_min is not None else None
    hi = jnp.asarray(cfg.u_max) if cfg.u_max is not None else None
    return jnp.clip(u, lo, hi)


def make_ilqr(
    dynamics: Callable,      # f(x, u, args) -> x_next
    stage_cost: Callable,    # l(x, u, t, args) -> scalar
    final_cost: Callable,    # lf(x, args) -> scalar
    cfg: ILQRConfig = ILQRConfig(),
):
    """Build a jittable solve(x0, u_init, args) -> ILQRSolution.

    `args` is an arbitrary pytree of per-problem data (targets, obstacle
    positions, ...) threaded through dynamics and costs, so one compiled
    solver serves every env: batch with `jax.vmap(solve)` over (x0, u_init,
    args).
    """
    H = cfg.horizon
    alphas = jnp.asarray(cfg.alphas)

    def rollout(x0, us, args):
        def body(x, u):
            xn = dynamics(x, _clamp(u, cfg), args)
            return xn, xn

        _, xs_tail = jax.lax.scan(body, x0, us)
        return jnp.concatenate([x0[None], xs_tail], axis=0)

    def total_cost(xs, us, args):
        ts = jnp.arange(H)
        l_run = jax.vmap(lambda x, u, t: stage_cost(x, u, t, args))(xs[:-1], us, ts)
        return l_run.sum() + final_cost(xs[-1], args)

    def linearize(xs, us, args):
        ts = jnp.arange(H)
        fx = jax.vmap(lambda x, u: jax.jacfwd(dynamics, 0)(x, u, args))(xs[:-1], us)
        fu = jax.vmap(lambda x, u: jax.jacfwd(dynamics, 1)(x, u, args))(xs[:-1], us)
        lx = jax.vmap(lambda x, u, t: jax.grad(stage_cost, 0)(x, u, t, args))(xs[:-1], us, ts)
        lu = jax.vmap(lambda x, u, t: jax.grad(stage_cost, 1)(x, u, t, args))(xs[:-1], us, ts)
        lxx = jax.vmap(lambda x, u, t: jax.hessian(stage_cost, 0)(x, u, t, args))(xs[:-1], us, ts)
        luu = jax.vmap(lambda x, u, t: jax.hessian(stage_cost, 1)(x, u, t, args))(xs[:-1], us, ts)
        lux = jax.vmap(
            lambda x, u, t: jax.jacfwd(jax.grad(stage_cost, 1), 0)(x, u, t, args)
        )(xs[:-1], us, ts)
        return fx, fu, lx, lu, lxx, luu, lux

    def backward(xs, us, args, reg):
        fx, fu, lx, lu, lxx, luu, lux = linearize(xs, us, args)
        Vx = jax.grad(final_cost, 0)(xs[-1], args)
        Vxx = jax.hessian(final_cost, 0)(xs[-1], args)
        m = us.shape[-1]
        eye_m = jnp.eye(m, dtype=us.dtype)

        def bwd(carry, inp):
            Vx, Vxx = carry
            fx_t, fu_t, lx_t, lu_t, lxx_t, luu_t, lux_t = inp
            Qx = lx_t + fx_t.T @ Vx
            Qu = lu_t + fu_t.T @ Vx
            Qxx = lxx_t + fx_t.T @ Vxx @ fx_t
            Quu = luu_t + fu_t.T @ Vxx @ fu_t + reg * eye_m
            Qux = lux_t + fu_t.T @ Vxx @ fx_t
            Quu = 0.5 * (Quu + Quu.T)
            chol, low = jax.scipy.linalg.cho_factor(Quu)
            k = -jax.scipy.linalg.cho_solve((chol, low), Qu)
            K = -jax.scipy.linalg.cho_solve((chol, low), Qux)
            Vx_n = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx_n = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
            return (Vx_n, Vxx_n), (k, K)

        (_, _), (ks, Ks) = jax.lax.scan(
            bwd, (Vx, Vxx), (fx, fu, lx, lu, lxx, luu, lux), reverse=True
        )
        return ks, Ks

    def forward(xs_ref, us_ref, ks, Ks, args, alpha):
        def body(carry, inp):
            x, c, t = carry
            x_ref, u_ref, k, K = inp
            u = _clamp(u_ref + alpha * k + K @ (x - x_ref), cfg)
            c = c + stage_cost(x, u, t, args)
            xn = dynamics(x, u, args)
            return (xn, c, t + 1), (xn, u)

        (xT, c, _), (xs_tail, us_new) = jax.lax.scan(
            body, (xs_ref[0], jnp.zeros((), xs_ref.dtype), 0),
            (xs_ref[:-1], us_ref, ks, Ks),
        )
        c = c + final_cost(xT, args)
        xs_new = jnp.concatenate([xs_ref[0][None], xs_tail], axis=0)
        return xs_new, us_new, c

    def solve(x0, u_init, args) -> ILQRSolution:
        us0 = _clamp(u_init, cfg)
        xs0 = rollout(x0, us0, args)
        c0 = total_cost(xs0, us0, args)

        def iteration(carry, _):
            xs, us, cost, reg = carry
            ks, Ks = backward(xs, us, args, reg)
            # parallel line search: roll out every alpha at once
            xs_c, us_c, c_c = jax.vmap(
                lambda a: forward(xs, us, ks, Ks, args, a)
            )(alphas)
            # a failed Cholesky (non-PD Quu before enough regularization)
            # yields NaN costs; treat them as rejected candidates
            c_c = jnp.where(jnp.isnan(c_c), jnp.inf, c_c)
            best = jnp.argmin(c_c)
            c_best = c_c[best]
            improved = c_best < cost
            xs_n = jnp.where(improved, xs_c[best], xs)
            us_n = jnp.where(improved, us_c[best], us)
            cost_n = jnp.where(improved, c_best, cost)
            # Levenberg-Marquardt style regularization schedule
            reg_n = jnp.where(
                improved,
                jnp.maximum(reg * 0.5, cfg.reg_min),
                jnp.minimum(reg * 10.0, cfg.reg_max),
            )
            return (xs_n, us_n, cost_n, reg_n), cost_n

        (xs, us, cost, _), trace = jax.lax.scan(
            iteration, (xs0, us0, c0, jnp.asarray(cfg.reg_init)), None,
            length=cfg.n_iters,
        )
        return ILQRSolution(xs=xs, us=us, cost=cost, cost_trace=trace)

    return solve
