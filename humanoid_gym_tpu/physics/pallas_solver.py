"""Pallas TPU kernel for the batched APGD contact solve.

Motivation (measured): the XLA-level APGD loop is ~half of physics time at
4096 envs, and almost all of it is op-dispatch latency — each of the
16 iterations issues ~10 small HBM-bound ops. This kernel runs the entire
iteration loop on-chip: one grid step processes a tile of 128 environments
laid out env-on-lanes ((row, env) = (sublane, lane) — the native VPU shape),
so 16 iterations become straight-line vector code over VMEM-resident tiles
with zero dispatch overhead.

Layout contract (marshalled by `apgd_solve_pallas`):
  A:    (T, R, R, 128)  Delassus, rows padded 60 -> R=64
  r:    (T, R, 128)     gradient offset (u0 - target), sign-folded
  step: (T, 1, 128)     1/L per env
  mu:   (T, 1, 128)     friction coefficient per env
  -> lam (T, R, 128)

Sign folding: joint-limit rows are pre-multiplied by their direction sign
outside the kernel (A' = s s^T ∘ A, r' = s ∘ r), so in-kernel projection is
uniformly: 16 friction cones + nonnegativity on the limit rows; padding rows
project to 0 via a row mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_POINTS = 16  # contact blocks (8 sole points x 2 feet)
ROWS = 64  # padded row count (60 real rows)
ENV_TILE = 128


def _apgd_kernel(
    A_ref, r_ref, step_ref, mu_ref, nlim_ref, iters_ref, lam_ref
):
    A = A_ref[0]  # (R, R, 128)
    r = r_ref[0]  # (R, 128)
    step = step_ref[0]  # (1, 128)
    mu = mu_ref[0]  # (1, 128)

    nc3 = 3 * N_POINTS
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, ENV_TILE), 0)
    nlim = nlim_ref[0]
    valid = (row_ids < (nc3 + nlim)).astype(A.dtype)

    def project(x):
        # friction-cone projection on the 16 interleaved (tx, ty, n) blocks
        blocks = x[:nc3].reshape(N_POINTS, 3, ENV_TILE)
        tx = blocks[:, 0]
        ty = blocks[:, 1]
        n = blocks[:, 2]
        nt = jnp.sqrt(tx * tx + ty * ty + 1e-24)
        inside = nt <= mu * n
        polar = mu * nt <= -n
        n_p = jnp.maximum((mu * nt + n) / (1.0 + mu * mu), 0.0)
        scale = mu * n_p / nt
        keep = inside.astype(x.dtype)
        mid = (1.0 - keep) * (1.0 - polar.astype(x.dtype))
        tx_n = keep * tx + mid * tx * scale
        ty_n = keep * ty + mid * ty * scale
        n_n = keep * n + mid * n_p
        cone = jnp.stack([tx_n, ty_n, n_n], axis=1).reshape(nc3, ENV_TILE)
        rest = jnp.maximum(x[nc3:], 0.0)
        # padding + inactive rows zeroed by the validity mask
        return jnp.concatenate([cone, rest], axis=0) * valid

    def body(_, carry):
        lam, y, theta = carry
        g = jnp.sum(A * y[None, :, :], axis=1) + r  # (R, 128) matvec
        lam_new = project(y - step * g)
        d = lam_new - lam
        restart = jnp.sum(g * d, axis=0, keepdims=True) > 0.0  # (1, 128)
        theta = jnp.where(restart, 1.0, theta)
        theta_new = 0.5 * (theta * jnp.sqrt(theta * theta + 4.0) - theta * theta)
        beta = theta * (1.0 - theta) / (theta * theta + theta_new)
        beta = jnp.where(restart, 0.0, beta)
        y_new = lam_new + beta * d
        return lam_new, y_new, theta_new

    zero = jnp.zeros((ROWS, ENV_TILE), A.dtype)
    ones = jnp.ones((1, ENV_TILE), A.dtype)
    lam, _, _ = jax.lax.fori_loop(0, iters_ref[0], body, (zero, zero, ones))
    lam_ref[0] = lam


@functools.partial(jax.jit, static_argnames=("iterations", "interpret"))
def apgd_solve_pallas(
    A: jnp.ndarray,  # (N, nrow, nrow)
    u0: jnp.ndarray,  # (N, nrow)
    lo_bound: jnp.ndarray,  # (N, n_points)
    limit_sign: jnp.ndarray,  # (N, nlim)
    limit_bound: jnp.ndarray,  # (N, nlim)
    mu: jnp.ndarray,  # (N,)
    iterations: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched front-end: marshal to env-lane-major tiles, run the kernel,
    unmarshal. Returns lam (N, nrow)."""
    N, nrow, _ = A.shape
    nc3 = 3 * N_POINTS
    nlim = nrow - nc3

    # sign folding for limit rows
    s = jnp.concatenate(
        [jnp.ones((N, nc3), A.dtype), limit_sign.astype(A.dtype)], axis=1
    )
    A_f = A * s[:, :, None] * s[:, None, :]
    target = jnp.zeros((N, nrow), A.dtype)
    target = target.at[:, jnp.arange(N_POINTS) * 3 + 2].set(lo_bound)
    target = target.at[:, nc3:].set(limit_bound)  # already sign-local bound
    r = s * u0 - target

    L = jnp.maximum(jnp.max(jnp.sum(jnp.abs(A_f), axis=-1), axis=-1), 1e-6)
    step = (1.0 / L).astype(A.dtype)

    # pad rows to ROWS, envs to a multiple of ENV_TILE
    n_pad = (-N) % ENV_TILE
    Np = N + n_pad
    T = Np // ENV_TILE

    def pad_envs(x, extra_row_pad):
        x = jnp.pad(x, ((0, n_pad),) + extra_row_pad)
        return x

    A_p = pad_envs(A_f, ((0, ROWS - nrow), (0, ROWS - nrow)))
    r_p = pad_envs(r, ((0, ROWS - nrow),))
    step_p = pad_envs(step[:, None], ((0, 0),))
    mu_p = pad_envs(mu.astype(A.dtype)[:, None], ((0, 0),))

    # (Np, R, R) -> (T, R, R, 128) env-lane-major
    def to_tiles(x):
        # x: (Np, ...) -> (T, 128, ...) -> move env to last axis
        x = x.reshape((T, ENV_TILE) + x.shape[1:])
        return jnp.moveaxis(x, 1, -1)

    A_t = to_tiles(A_p)
    r_t = to_tiles(r_p)
    step_t = to_tiles(step_p)
    mu_t = to_tiles(mu_p)

    lam_t = pl.pallas_call(
        _apgd_kernel,
        out_shape=jax.ShapeDtypeStruct((T, ROWS, ENV_TILE), A.dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (1, ROWS, ROWS, ENV_TILE),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ROWS, ENV_TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, ENV_TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, ENV_TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ROWS, ENV_TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        A_t,
        r_t,
        step_t,
        mu_t,
        jnp.asarray([nlim], jnp.int32),
        jnp.asarray([iterations], jnp.int32),
    )

    # unmarshal: (T, R, 128) -> (Np, R) -> (N, nrow), unfold signs
    lam = jnp.moveaxis(lam_t, -1, 1).reshape(Np, ROWS)[:N, :nrow]
    return lam * s


def make_apgd_batched(iterations: int, interpret: bool = False):
    """Solver with a custom vmap rule: the single-env call falls back to the
    XLA APGD loop, but under jax.vmap the whole batch dispatches to the
    Pallas kernel — so the (vmapped single-env) physics code needs no
    batching-aware restructuring."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def solve(A, u0, lo, sign, lb, mu):
        from .contact import apgd_solve

        return apgd_solve(A, u0, N_POINTS, lo, sign, lb, mu, iterations)

    @solve.def_vmap
    def _vmap_rule(axis_size, in_batched, A, u0, lo, sign, lb, mu):
        args = [A, u0, lo, sign, lb, mu]
        args = [
            x if b else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))
            for x, b in zip(args, in_batched)
        ]
        lam = apgd_solve_pallas(
            *args, iterations=iterations, interpret=interpret
        )
        return lam, True

    return solve
