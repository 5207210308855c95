r"""Particle Filter.  Ref: pypose/module/pf.py."""

import jax
import jax.numpy as jnp

from .ekf import EKF
from ..function.linalg import bvv
from ..lietensor.lietensor import _next_key


class PF(EKF):
    r"""Batched particle filter: samples ``particles`` states from
    N(x, P), propagates them through the full nonlinear model, weights by
    Gaussian observation likelihood, and resamples by inverse-CDF — all
    fixed-shape ops, so the filter jits and vmaps.

    Ref: pypose/module/pf.py:8-196 (forward :130).

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> from pypose_tpu.module import NLS, PF
        >>> class Sys(NLS):
        ...     def state_transition(self, state, input, t=None):
        ...         return jnp.cos(state) + input
        ...     def observation(self, state, input, t=None):
        ...         return jnp.sin(state) + input
        >>> pf = PF(Sys(), Q=jnp.eye(2) * 0.01, R=jnp.eye(2) * 0.01,
        ...         particles=200)
        >>> x1, P1 = pf(jnp.zeros(2), jnp.array([0.1, -0.1]), jnp.zeros(2),
        ...             jnp.eye(2), key=jax.random.PRNGKey(0))
        >>> x1.shape, P1.shape
        ((2,), (2, 2))
    """

    def __init__(self, model, Q=None, R=None, particles=1000):
        super().__init__(model, Q, R)
        self.particles = particles

    def forward(self, x, y, u, P, Q=None, R=None, t=None, key=None):
        Q = Q if Q is not None else self.Q
        R = R if R is not None else self.R
        key = _next_key() if key is None else key
        k1, k2 = jax.random.split(key)
        self.model.set_refpoint(state=x, input=u, t=t)
        n = x.shape[-1]
        xp = self.generate_particles(x, n * P, k1)
        # particles live on axis -2; give the input a matching singleton
        # axis so batched ``(B, n)`` inputs broadcast against ``(B, p, n)``
        # particle clouds (the reference crashes on this case)
        up = jnp.expand_dims(u, -2)
        xs = self.model.state_transition(xp, up, t)
        ye = self.model.observation(xs, up, t)
        q = self.relative_likelihood(y, ye, R)
        xr = self.resample_particles(q, xs, k2)
        x = xr.mean(axis=-2)
        ex = xr - x[..., None, :]
        P = self.compute_cov(ex, ex, Q)
        return x, P

    def generate_particles(self, x, P, key):
        """Sample particles ~ N(x, P).  Ref: pf.py:166-185."""
        return jax.random.multivariate_normal(
            key, x, P, shape=(self.particles,) + x.shape[:-1],
            dtype=x.dtype).swapaxes(0, -2) if x.ndim > 1 else \
            jax.random.multivariate_normal(
                key, x, P, shape=(self.particles,), dtype=x.dtype)

    def relative_likelihood(self, y, ye, R):
        """Softmax of Gaussian log-likelihoods.  Ref: pf.py:157-164."""
        d = y[..., None, :] - ye
        Rinv = jnp.linalg.inv(R)
        logp = -0.5 * jnp.einsum('...i,...ij,...j->...', d, Rinv, d)
        return jax.nn.softmax(logp, axis=-1)

    def resample_particles(self, q, x, key):
        """Inverse-CDF resampling, batched over leading dims.

        Ref: pf.py:186-194 — which CRASHES for batched inputs
        (torch.searchsorted boundaries error at (B, n) states, verified
        against the executed reference); here the searchsorted is
        vectorized over batch dims with independent uniform draws per
        batch element, so ``PF`` composes with batched systems like
        every other filter."""
        r = jax.random.uniform(key, q.shape, dtype=x.dtype)
        cumsumq = jnp.cumsum(q, axis=-1)
        idx = jnp.vectorize(jnp.searchsorted,
                            signature='(p),(p)->(p)')(cumsumq, r)
        idx = jnp.clip(idx, 0, self.particles - 1)
        return jnp.take_along_axis(x, idx[..., None], axis=-2)

    def compute_cov(self, a, b, Q=0):
        """Covariance of particles.  Ref: pf.py:195-196."""
        return Q + bvv(a, b).mean(axis=-3)
