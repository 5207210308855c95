r"""Discrete-time (iterative) LQR.

Ref: pypose/module/lqr.py.  The backward Riccati recursion and the forward
rollout are sequential in T; both run as Python loops over jitted system
calls here (each step linearizes via NLS jacrev).  For LTI systems the
whole forward is jit-compatible.
"""

import jax.numpy as jnp

from ..nn import Module
from ..function.linalg import bmv, bvmv
from .dynamics import runsys


class LQR(Module):
    r"""LQR with quadratic cost Q (stage cost over [x; u]) and linear cost p.

    Ref: lqr.py:8-380 (forward :284-308, backward :310-355, rollout :357-380).
    """

    def __init__(self, system, Q, p, T):
        super().__init__()
        self.system = system
        self.Q, self.p, self.T = jnp.asarray(Q), jnp.asarray(p), T
        self.x_traj = None
        self.u_traj = None
        if self.Q.ndim == 3:
            self.Q = jnp.tile(self.Q[..., None, :, :], (1, self.T, 1, 1))
        if self.p.ndim == 2:
            self.p = jnp.tile(self.p[..., None, :], (1, self.T, 1))
        self.n_batch = self.p.shape[:-2]
        assert self.Q.shape[:-1] == self.p.shape, 'Shape not compatible.'
        assert self.Q.shape[-1] == self.Q.shape[-2], 'Shape not compatible.'
        assert self.Q.ndim == 4 or self.p.ndim == 3, 'Shape not compatible.'
        self.dtype = self.p.dtype

    def forward(self, x_init, dt=None, u_traj=None, u_lower=None,
                u_upper=None, du=None):
        K, k = self.lqr_backward(x_init, dt, u_traj, u_lower, u_upper, du)
        x, u, cost = self.lqr_forward(x_init, K, k, u_lower, u_upper, du)
        return x, u, cost

    def lqr_backward(self, x_init, dt, u_traj=None, u_lower=None,
                     u_upper=None, du=None):
        """Reverse Riccati recursion with per-step linearization.

        Ref: lqr.py:310-355.
        """
        ns, nsc = x_init.shape[-1], self.p.shape[-1]
        nc = nsc - ns
        if u_traj is None:
            self.u_traj = jnp.zeros(self.n_batch + (self.T, nc),
                                    dtype=self.dtype)
        else:
            self.u_traj = jnp.asarray(u_traj)
        x0 = jnp.broadcast_to(x_init[..., None, :],
                              self.n_batch + (self.T, ns))
        self.x_traj = runsys(self.system, self.T, x0, self.u_traj)

        Ks, ks = [None] * self.T, [None] * self.T
        xut = jnp.concatenate(
            [self.x_traj[..., :self.T, :], self.u_traj], axis=-1)
        p = bmv(self.Q, xut) + self.p

        V = v = None
        for t in range(self.T - 1, -1, -1):
            if t == self.T - 1:
                Qt = self.Q[..., t, :, :]
                qt = p[..., t, :]
            else:
                self.system.set_refpoint(
                    state=self.x_traj[..., t, :],
                    input=self.u_traj[..., t, :],
                    t=jnp.asarray(t if dt is None else t * dt))
                A = _sq(self.system.A)
                B = _sq(self.system.B)
                F = jnp.concatenate([A, B], axis=-1)
                Qt = self.Q[..., t, :, :] + jnp.swapaxes(F, -1, -2) @ V @ F
                qt = p[..., t, :] + bmv(jnp.swapaxes(F, -1, -2), v)
            Qxx, Qxu = Qt[..., :ns, :ns], Qt[..., :ns, ns:]
            Qux, Quu = Qt[..., ns:, :ns], Qt[..., ns:, ns:]
            qx, qu = qt[..., :ns], qt[..., ns:]
            L = jnp.linalg.cholesky(Quu)
            Kt = -_cho_solve(L, Qux)
            kt = -_cho_solve(L, qu[..., None])[..., 0]
            Ks[t], ks[t] = Kt, kt
            V = Qxx + Qxu @ Kt + jnp.swapaxes(Kt, -1, -2) @ Qux \
                + jnp.swapaxes(Kt, -1, -2) @ Quu @ Kt
            v = qx + bmv(Qxu, kt) + bmv(jnp.swapaxes(Kt, -1, -2), qu) \
                + bmv(jnp.swapaxes(Kt, -1, -2) @ Quu, kt)
        K = jnp.stack(Ks, axis=-3)
        k = jnp.stack(ks, axis=-2)
        return K, k

    def lqr_forward(self, x_init, K, k, u_lower=None, u_upper=None, du=None):
        """Rollout accumulating quadratic cost.  Ref: lqr.py:357-380."""
        assert x_init.ndim == 2, 'Shape not compatible.'
        ns, nc = self.x_traj.shape[-1], self.u_traj.shape[-1]
        us, xs = [], [x_init]
        cost = jnp.zeros(self.n_batch, dtype=self.dtype)
        xt = x_init
        for t in range(self.T):
            Kt, kt = K[..., t, :, :], k[..., t, :]
            delta_xt = xt - self.x_traj[..., t, :]
            ut = bmv(Kt, delta_xt) + kt + self.u_traj[..., t, :]
            us.append(ut)
            xut = jnp.concatenate([xt, ut], axis=-1)
            xt = self.system(xt, ut)[0]
            xs.append(xt)
            cost = cost + 0.5 * bvmv(xut, self.Q[..., t, :, :], xut) \
                + jnp.sum(xut * self.p[..., t, :], axis=-1)
        x = jnp.stack(xs, axis=-2)
        u = jnp.stack(us, axis=-2)
        return x, u, cost


def _sq(J):
    """NLS jacobians have shape (*, n, *, n): collapse the middle batch
    (reference squeezes dim -2, lqr.py:330-331)."""
    if J.ndim >= 4 and J.shape[-2] == 1:
        return J.squeeze(-2)
    return J


def _cho_solve(L, B):
    """Batched cholesky solve with lower factor L."""
    import jax.scipy.linalg as jsp
    return jsp.cho_solve((L, True), B)
