"""Unrolled small-matrix linear algebra for the 1 kHz hot path.

XLA lowers lax.linalg.cholesky / triangular_solve to internal while-loops
that perform poorly for tiny batched matrices on TPU (18x18 mass matrices,
60-column solves). These unrolled versions emit straight-line vectorized ops
(one outer-product / matvec per elimination step) that XLA fuses across the
huge env batch — the classic small-n, big-batch trade.

Exactness: same algorithm, same f32 arithmetic — validated against
jax.numpy.linalg in tests/test_physics_oracle.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_unrolled(M: jnp.ndarray) -> jnp.ndarray:
    """Cholesky factor L (lower) of an SPD (n, n) matrix, n static & small.

    Outer-product form, n unrolled steps; batch via vmap.
    """
    n = M.shape[-1]
    L = jnp.zeros_like(M)
    A = M
    for k in range(n):
        d = jnp.sqrt(jnp.maximum(A[k, k], 1e-12))
        col = A[:, k] / d
        col = col.at[:k].set(0.0).at[k].set(d)
        L = L.at[:, k].set(col)
        # rank-1 downdate of the trailing block (full outer product; the
        # already-eliminated rows/cols are dead and masked on future reads)
        v = col.at[k].set(0.0)
        A = A - jnp.outer(v, v)
    return L


def solve_lower_unrolled(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L X = B with L lower-triangular (n,n), B (n,...) — n unrolled
    forward-substitution steps."""
    n = L.shape[-1]
    X = B
    for k in range(n):
        xk = X[k] / L[k, k]
        X = X.at[k].set(xk)
        if k + 1 < n:
            X = X.at[k + 1 :].add(-L[k + 1 :, k][:, None] * xk[None, :] if X.ndim == 2 else -L[k + 1 :, k] * xk)
    return X


def solve_upper_unrolled(U: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve U X = B with U upper-triangular (n,n), B (n,...)."""
    n = U.shape[-1]
    X = B
    for k in reversed(range(n)):
        xk = X[k] / U[k, k]
        X = X.at[k].set(xk)
        if k > 0:
            X = X.at[:k].add(-U[:k, k][:, None] * xk[None, :] if X.ndim == 2 else -U[:k, k] * xk)
    return X


def solve_spd_chol(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) X = B given the Cholesky factor."""
    return solve_upper_unrolled(L.T, solve_lower_unrolled(L, B))
