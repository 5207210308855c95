r"""Unscented Kalman Filter.  Ref: pypose/module/ukf.py."""

import jax.numpy as jnp

from .ekf import EKF
from ..function.linalg import bmv


class UKF(EKF):
    r"""Batched Unscented Kalman Filter: propagates ``2n+1`` sigma points
    through the full nonlinear model (no Jacobians) with spread parameter
    ``k`` (default ``3 - n``) and a pluggable matrix square root
    (default Cholesky).

    Ref: pypose/module/ukf.py:7-231 (forward :163, compute_cov :228).

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> from pypose_tpu.module import NLS, UKF
        >>> class Sys(NLS):
        ...     def state_transition(self, state, input, t=None):
        ...         return jnp.cos(state) + input
        ...     def observation(self, state, input, t=None):
        ...         return jnp.sin(state) + input
        >>> ukf = UKF(Sys(), Q=jnp.eye(2) * 0.01, R=jnp.eye(2) * 0.01)
        >>> x, P = jnp.zeros(2), jnp.eye(2)
        >>> x1, P1 = ukf(x, jnp.array([0.1, -0.1]), jnp.zeros(2), P)
        >>> x1.shape, P1.shape
        ((2,), (2, 2))
    """

    def __init__(self, model, Q=None, R=None, msqrt=None):
        super().__init__(model, Q, R)
        self.msqrt = jnp.linalg.cholesky if msqrt is None else msqrt

    def forward(self, x, y, u, P, Q=None, R=None, t=None, k=None):
        k = 3 - x.shape[-1] if k is None else k
        Q = Q if Q is not None else self.Q
        R = R if R is not None else self.R
        self.model.set_refpoint(state=x, input=u, t=t)
        xs, w = self.sigma_weight_points(x, P, k)
        xs = self.model.state_transition(xs, u, t)
        xe = (w * xs).sum(axis=-2)
        ex = xe[..., None, :] - xs
        P = self.compute_cov(ex, ex, w, Q)
        xs, w = self.sigma_weight_points(xe, P, k)
        ys = self.model.observation(xs, u, t)
        ye = (w * ys).sum(axis=-2)
        ey = ye[..., None, :] - ys
        Py = self.compute_cov(ey, ey, w, R)
        Pxy = self.compute_cov(ex, ey, w)
        K = Pxy @ jnp.linalg.pinv(Py)
        x = xe + bmv(K, y - ye)
        P = P - K @ Py @ jnp.swapaxes(K, -1, -2)
        return x, P

    def sigma_weight_points(self, x, P, k):
        """2n+1 sigma points and weights.  Ref: ukf.py:196-226."""
        assert x.shape[-1] == P.shape[-1] == P.shape[-2], 'Invalid shape'
        n, xe = x.shape[-1], x[..., None, :]
        xr = jnp.swapaxes(self.msqrt((n + k) * P), -1, -2)
        we = jnp.full(xe.shape[:-1], k / (n + k), dtype=x.dtype)
        wr = jnp.full(xr.shape[:-1], 1 / (2 * (n + k)), dtype=x.dtype)
        p = jnp.concatenate([xe, xe + xr, xe - xr], axis=-2)
        w = jnp.concatenate([we, wr, wr], axis=-1)
        return p, w[..., None]

    def compute_cov(self, a, b, w, Q=0):
        """Weighted covariance.  Ref: ukf.py:228-231."""
        a, b = a[..., None], b[..., None]
        return Q + (w[..., None] * a @ jnp.swapaxes(b, -1, -2)).sum(axis=-3)
