r"""Extended Kalman Filter.  Ref: pypose/module/ekf.py."""

import jax.numpy as jnp

from ..nn import Module
from ..function.linalg import bmv


class EKF(Module):
    r"""Batched Extended Kalman Filter: linearize the system at the
    current estimate via the model's NLS auto-Jacobians (``jacrev`` of
    ``state_transition``/``observation``), then predict / gain / update:

    .. math:: P^- = A P A^\top + Q,\quad
              K = P^- C^\top (C P^- C^\top + R)^{-1},\quad
              P^+ = (I - KC)\,P^-(I - KC)^\top + K R K^\top

    (Joseph-form update).  One ``forward`` call is one filter step; for
    long rollouts use :func:`pypose_tpu.module.filter_rollout`, which
    scans the whole trajectory as one XLA program.

    Ref: pypose/module/ekf.py:7-197 (forward :132-164).

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> from pypose_tpu.module import NLS, EKF
        >>> class Sys(NLS):
        ...     def state_transition(self, state, input, t=None):
        ...         return jnp.cos(state) + input
        ...     def observation(self, state, input, t=None):
        ...         return jnp.sin(state) + input
        >>> ekf = EKF(Sys(), Q=jnp.eye(2) * 0.01, R=jnp.eye(2) * 0.01)
        >>> x, P = jnp.zeros(2), jnp.eye(2) * 100.0
        >>> y, u = jnp.array([0.1, -0.1]), jnp.zeros(2)
        >>> x1, P1 = ekf(x, y, u, P)
        >>> bool(jnp.trace(P1) < jnp.trace(P))    # uncertainty contracts
        True
    """

    def __init__(self, model, Q=None, R=None):
        super().__init__()
        self.set_uncertainty(Q=Q, R=R)
        self.model = model

    def forward(self, x, y, u, P, Q=None, R=None, t=None):
        self.model.set_refpoint(state=x, input=u, t=t)
        I = jnp.eye(P.shape[-1], dtype=P.dtype)
        A = self.model.A
        C = self.model.C
        Q = Q if Q is not None else self.Q
        R = R if R is not None else self.R
        xm = self.model.state_transition(x, u, t=t)
        P = A @ P @ jnp.swapaxes(A, -1, -2) + Q
        K = P @ jnp.swapaxes(C, -1, -2) @ jnp.linalg.pinv(
            C @ P @ jnp.swapaxes(C, -1, -2) + R)
        e = y - self.model.observation(x, u, t=t)
        xp = xm + bmv(K, e)
        # Joseph-form update: algebraically equal to (I-KC)P for the
        # optimal gain but preserves symmetry/PSD under f32 rounding.
        # (The reference uses the short form, ekf.py:157-164 — values
        # agree to float tolerance; parity pinned in
        # tests/module/test_reference_parity_modules.py.)
        IKC = I - K @ C
        P = IKC @ P @ jnp.swapaxes(IKC, -1, -2) \
            + K @ R @ jnp.swapaxes(K, -1, -2)
        return xp, P

    @property
    def Q(self):
        if not hasattr(self, '_Q'):
            raise NotImplementedError(
                'Call set_uncertainty() to define transition covariance Q.')
        return self._Q

    @property
    def R(self):
        if not hasattr(self, '_R'):
            raise NotImplementedError(
                'Call set_uncertainty() to define observation covariance R.')
        return self._R

    def set_uncertainty(self, Q=None, R=None):
        if Q is not None:
            self.register_buffer('_Q', Q)
        if R is not None:
            self.register_buffer('_R', R)
