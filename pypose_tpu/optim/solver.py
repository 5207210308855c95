r"""Linear solvers for the NLS optimizers.

Ref: pypose/optim/solver.py.  All solvers are pure callables usable inside
``jit``/``lax.while_loop``.  ``CG``/``PCG`` accept either a dense matrix or a
matvec callable — the matvec form is the TPU-native path for sparse normal
equations (the reference needs an external CUDA backend for this;
optimizer.py:428-432).
"""

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsp


class PINV:
    """Moore-Penrose pseudo-inverse solve.  Ref: solver.py:10-70."""

    def __init__(self, atol=None, rtol=None, hermitian=False):
        self.atol, self.rtol, self.hermitian = atol, rtol, hermitian

    def __call__(self, A, b):
        rcond = self.rtol
        return jnp.linalg.pinv(A, rcond=rcond, hermitian=self.hermitian) @ b


class LSTSQ:
    """Least-squares solve (batched over leading dims).  Ref: solver.py:71-154."""

    def __init__(self, rcond=None, driver=None):
        self.rcond, self.driver = rcond, driver

    def __call__(self, A, b):
        if A.ndim == 2 and b.ndim <= 2:
            return jnp.linalg.lstsq(A, b, rcond=self.rcond)[0]
        # batched: b is batch + (M,) or batch + (M, K)
        vdim = 1 if b.ndim == A.ndim - 1 else 2
        batch = jnp.broadcast_shapes(A.shape[:-2], b.shape[:-vdim])
        A2 = jnp.broadcast_to(A, batch + A.shape[-2:])
        b2 = jnp.broadcast_to(b, batch + b.shape[-vdim:])
        A2 = A2.reshape((-1,) + A2.shape[-2:])
        b2 = b2.reshape((-1,) + b2.shape[-vdim:])
        out = jax.vmap(lambda a, bb: jnp.linalg.lstsq(
            a, bb, rcond=self.rcond)[0])(A2, b2)
        return out.reshape(batch + out.shape[1:])


class Cholesky:
    """Cholesky solve for PD systems.  Ref: solver.py:155-218.

    Returns NaN (rather than raising) on non-PD input so the LM reject loop
    can detect failure inside ``lax.while_loop``.
    """

    def __init__(self, upper=False):
        self.upper = upper

    def __call__(self, A, b):
        L = jnp.linalg.cholesky(A)
        return jsp.cho_solve((L, True), b)


class CG:
    """Batched conjugate gradient (scipy-faithful).  Ref: solver.py:219-340.

    ``A`` may be a dense matrix or a matvec callable; ``M`` an optional
    preconditioner (matrix or callable).
    """

    def __init__(self, maxiter=None, tol=1e-5):
        self.maxiter, self.tol = maxiter, tol

    def __call__(self, A, b, x=None, M=None):
        matvec = A if callable(A) else (lambda v: A @ v)
        squeeze = False
        if b.ndim == 1:
            pass
        elif b.ndim == 2 and b.shape[-1] == 1:
            b = b[:, 0]
            squeeze = True
        n = b.shape[-1] if b.ndim == 1 else b.shape[-2]
        maxiter = self.maxiter if self.maxiter is not None else 10 * n
        if x is not None and x.ndim == 2:
            x = x[:, 0]
        precond = None
        if M is not None:
            precond = M if callable(M) else (lambda v: M @ v)
        out, _ = jax.scipy.sparse.linalg.cg(
            matvec, b, x0=x, tol=self.tol, maxiter=maxiter, M=precond)
        return out[:, None] if squeeze else out


class PCG(CG):
    """Preconditioned CG with Jacobi (diagonal) preconditioner by default.

    TPU-native replacement for the reference's external
    ``bae.utils.pysolvers.PCG`` (solver.py:343-371): on TPU the sparse
    normal equations are solved matvec-only, so PCG == CG + preconditioner.
    """

    def __call__(self, A, b, x=None, M=None):
        if M is None and not callable(A):
            d = jnp.diagonal(A)
            dinv = jnp.where(d > 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)
            M = lambda v: dinv[:, None] * v if v.ndim == 2 else dinv * v
        return super().__call__(A, b, x=x, M=M)
