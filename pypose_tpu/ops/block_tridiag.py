r"""Block-tridiagonal solves via parallel cyclic reduction (BCR).

Pose graphs are chain-dominated: the odometry part of J^T W J is block
tridiagonal with 6x6 blocks, and its condition number grows ~O(N^2) with
chain length, which stalls Jacobi-preconditioned CG (measured: >200
iterations on sphere2500).  Solving the tridiagonal part *exactly* as the
preconditioner removes the chain's long-range stiffness.

Cyclic reduction eliminates odd-indexed block unknowns level by level —
O(log N) levels of batched 6x6 matmuls/inverses over strided slices, which
is exactly the shape TPUs like.  The factorization (matrix-dependent) is
computed once per LM step; the solve (rhs-dependent) runs per CG iteration.

System convention: T x = b with

    T = blocktridiag(L, D, U):  row i couples (i-1, i, i+1) via
    L[i] (sub), D[i] (diag), U[i] (super);  L[0] and U[N-1] are ignored.
"""

import math

import numpy as np

import jax
import jax.numpy as jnp

from .smallinv import blockinv

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _mv(M, v):
    return jnp.einsum('...ij,...j->...i', M, v, precision=_HI)


def _pad_pow2(D, L, U):
    N = D.shape[0]
    Np = 1 << max(1, math.ceil(math.log2(max(N, 2))))
    if Np == N:
        return D, L, U, N
    t = D.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(t, dtype=D.dtype), (Np - N, t, t))
    zero = jnp.zeros((Np - N, t, t), dtype=D.dtype)
    return (jnp.concatenate([D, eye]), jnp.concatenate([L, zero]),
            jnp.concatenate([U, zero]), N)


def bcr_factor(D, L, U):
    r"""Factor a block-tridiagonal SPD-ish system for repeated solves.

    Args: D [N,t,t], L [N,t,t] (L[0] unused), U [N,t,t] (U[N-1] unused).
    Returns an opaque factorization for :func:`bcr_solve`.
    """
    D, L, U, N = _pad_pow2(D, L, U)
    # decouple boundaries and padding
    L = L.at[0].set(0.0)
    U = U.at[N - 1].set(0.0)
    levels = []
    while D.shape[0] > 1:
        M = D.shape[0]
        Do, Lo, Uo = D[1::2], L[1::2], U[1::2]          # odd rows
        De, Le, Ue = D[0::2], L[0::2], U[0::2]          # even rows
        invDo = blockinv(Do)
        # even row i couples odd neighbors i-1 (via Le, valid for i>0)
        # and i+1 (via Ue, valid since M even => every even row has an odd
        # successor)
        alpha = _mm(Le, _shift_up(invDo))               # L_i D_{i-1}^{-1}
        beta = _mm(Ue, invDo)                           # U_i D_{i+1}^{-1}
        # zero the nonexistent i-1 coupling of row 0
        alpha = alpha.at[0].set(0.0)
        D_new = De - _mm(alpha, _shift_up(Uo)) - _mm(beta, Lo)
        L_new = -_mm(alpha, _shift_up(Lo))
        U_new = -_mm(beta, Uo)
        levels.append(dict(invDo=invDo, alpha=alpha, beta=beta,
                           Lo=Lo, Uo=Uo))
        D, L, U = D_new, L_new, U_new
    root_inv = blockinv(D)
    return dict(levels=levels, root_inv=root_inv, n=N)


def _shift_up(x):
    """x'[i] = x[i-1] with zeros at i = 0 (along axis 0)."""
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]])


def _shift_down(x):
    """x'[i] = x[i+1] with zeros at the end."""
    return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])])


def bcr_solve(fac, b):
    """Solve T x = b given a :func:`bcr_factor` result.  b: [N, t]."""
    N = fac['n']
    t = b.shape[-1]
    Np = 1 << max(1, math.ceil(math.log2(max(N, 2))))
    if Np != N:
        b = jnp.concatenate([b, jnp.zeros((Np - N, t), dtype=b.dtype)])
    # forward reduction
    bs = [b]
    for lv in fac['levels']:
        bo = b[1::2]
        be = b[0::2]
        b = be - _mv(lv['alpha'], _shift_up(bo)) - _mv(lv['beta'], bo)
        bs.append(b)
    # root
    x = _mv(fac['root_inv'], b)
    # back substitution
    for lv, b_prev in zip(reversed(fac['levels']), reversed(bs[:-1])):
        bo = b_prev[1::2]
        # x currently holds even-row solutions at this level
        xe = x
        x_up = xe                     # x_{i-1} for odd row i is even row i-1
        x_dn = _shift_down(xe)        # x_{i+1} for odd row i (0 past end)
        xo = _mv(lv['invDo'],
                 bo - _mv(lv['Lo'], x_up) - _mv(lv['Uo'], x_dn))
        M = xe.shape[0] * 2
        x = jnp.zeros((M, t), dtype=xe.dtype)
        x = x.at[0::2].set(xe).at[1::2].set(xo)
    return x[:N]


def blocktridiag_matvec(D, L, U, x):
    """Reference matvec for testing: row i = L x_{i-1} + D x_i + U x_{i+1}."""
    y = _mv(D, x)
    y = y + _mv(L, jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]]))
    y = y + _mv(U, jnp.concatenate([x[1:], jnp.zeros_like(x[:1])]))
    return y
