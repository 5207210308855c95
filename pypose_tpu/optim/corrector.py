r"""Kernel correctors scaling residuals/Jacobians for robust NLS.

Ref: pypose/optim/corrector.py.  jax.grad replaces torch autograd for the
kernel derivatives; everything is pure and jit-safe.
"""

import jax
import jax.numpy as jnp


class Trivial:
    """Identity placeholder.  Ref: optim/optimizer.py:51-61."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        out = tuple(args) + tuple(kwargs.values())
        return out[0] if len(out) == 1 else out


class FastTriggs:
    r"""First-order Triggs correction: scale (R, J) by sqrt(kernel'(||r||^2)).

    Ref: corrector.py:69-95.
    """

    def __init__(self, kernel):
        self.kernel = kernel

    def __call__(self, R, J):
        x = jnp.sum(R * R, axis=-1, keepdims=True)
        g1 = jax.grad(lambda v: jnp.sum(self.kernel(v)))(x)
        s = jnp.sqrt(jnp.maximum(g1, 0.0))
        sj = jnp.broadcast_to(s, R.shape).reshape(-1, 1)
        return s * R, sj * J


class Triggs:
    r"""Second-order Triggs correction (Eq. 11, Triggs et al. 1999).

    Ref: corrector.py:98-167.  Note: this implements the paper's residual
    correction sR = sqrt(g1)/(1 - alpha) * R on the corrected rows (the
    reference assigns se/(1-alpha) without the R factor — corrector.py:163 —
    which deviates from Eq. 11).
    """

    def __init__(self, kernel):
        self.kernel = kernel

    def compute_grads(self, R):
        x = jnp.sum(R * R, axis=-1, keepdims=True)
        f = lambda v: jnp.sum(self.kernel(v))
        g1 = jax.grad(f)(x)
        g2 = jax.grad(lambda v: jnp.sum(jax.grad(f)(v)))(x)
        return x, g1, g2

    def __call__(self, R, J):
        x, g1, g2 = self.compute_grads(R)
        se = jnp.sqrt(jnp.maximum(g1, 0.0))
        Jv = J.reshape(R.shape + (J.shape[-1],))
        sj = se[..., None]
        sR = se * R
        sJ = sj * Jv
        M = ~((x == 0) | (g2 <= 0))
        g1s = jnp.where(g1 == 0, 1.0, g1)
        alpha = 1.0 - jnp.sqrt(jnp.maximum(1.0 + 2.0 * x * g2 / g1s, 0.0))
        alpha = jnp.where(M, alpha, 0.0)
        one_minus = jnp.where(alpha == 1.0, 1.0, 1.0 - alpha)
        sR = jnp.where(M, se * R / one_minus, sR)
        xs = jnp.where(x == 0, 1.0, x)
        Q = jnp.einsum('...d,...k,...kl->...dl', R, R, sJ)
        sJ = jnp.where(M[..., None], sJ - (alpha / xs)[..., None] * Q, sJ)
        return sR, sJ.reshape(J.shape)
