r"""Discrete-time (iterative) LQR.

Ref: pypose/module/lqr.py (forward :284-308, backward :310-355, rollout
:357-380).  TPU-native design: both the reverse Riccati recursion and the
forward rollout are single ``lax.scan`` programs carrying ``(V, v)`` /
``(x, cost)``, so trace/compile time is O(1) in the horizon T (the
reference — and this module's first version — unrolled T host steps,
making T=512 horizons compile-hostile).  Per-step linearization happens
functionally inside the scan body (no module-state mutation, which would
leak tracers across separately-compiled programs).
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..nn import Module
from ..function.linalg import bmv, bvmv
from .dynamics import LTI


class LQR(Module):
    r"""Finite-horizon LQR: minimizes the quadratic stage cost
    :math:`\frac12 [x;u]^\top Q [x;u] + p^\top [x;u]` over horizon ``T``
    subject to the system dynamics (LTI/LTV directly; NLS systems are
    linearized about the nominal trajectory each step).

    Both the Riccati backward recursion and the forward rollout are
    ``lax.scan`` programs, so compile time is O(1) in ``T``.
    ``u_lower``/``u_upper``/``du`` are accepted for API parity but
    unused, matching the reference (pypose/module/lqr.py:284-308 ignores
    them).

    Ref: pypose/module/lqr.py:8-380.

    Example:
        >>> import jax.numpy as jnp
        >>> from pypose_tpu.module import LTI, LQR
        >>> ns, nc, T = 2, 1, 4
        >>> A = jnp.eye(ns); B = jnp.ones((ns, nc))
        >>> sys = LTI(A, B, jnp.eye(ns), jnp.zeros((ns, nc)))
        >>> Q = jnp.eye(ns + nc)[None]        # stage cost over [x; u]
        >>> p = jnp.zeros(ns + nc)[None]
        >>> lqr = LQR(sys, Q, p, T)
        >>> x, u, cost = lqr(jnp.ones(ns)[None])
        >>> x.shape, u.shape                  # T+1 states, T controls
        ((1, 5, 2), (1, 4, 1))
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
                u_upper=None, du=None, x_traj=None, mu=0.0, robust=False):
        K, k = self.lqr_backward(x_init, dt, u_traj, u_lower, u_upper, du,
                                 mu=mu, robust=robust, x_traj=x_traj)
        x, u, cost = self.lqr_forward(x_init, K, k, u_lower, u_upper, du,
                                      robust=robust)
        return x, u, cost

    def _time(self, t, dt=None):
        return t if dt is None else t * dt

    def _linearize(self, x, u, t):
        """Functional (A, B) at (x, u, t) — scan-body safe.

        LTI/LTV systems expose A/B as (possibly ``systime``-indexed)
        properties: read them with ``_t`` temporarily set to the traced t
        (restored immediately, so no tracer survives the trace).  Other
        systems (NLS, user Systems) linearize by jacrev of
        ``state_transition`` — the same jacobians NLS.set_refpoint exposes
        (dynamics.py:535-559 in the reference), computed without mutating
        the module.
        """
        sys = self.system
        if isinstance(sys, LTI):
            saved = sys._t
            sys.systime = t
            A, B = _sq(sys.A), _sq(sys.B)
            sys._t = saved
            return A, B
        A = _sq(jax.jacrev(lambda a: sys.state_transition(a, u, t))(x))
        B = _sq(jax.jacrev(lambda b: sys.state_transition(x, b, t))(u))
        return A, B

    def _step(self, x, u, t):
        """Functional state transition (no forward-hook time mutation)."""
        sys = self.system
        if isinstance(sys, LTI):
            saved = sys._t
            sys.systime = t
            out = sys.state_transition(x, u, t)
            sys._t = saved
            return out
        return sys.state_transition(x, u, t)

    def lqr_backward(self, x_init, dt, u_traj=None, u_lower=None,
                     u_upper=None, du=None, mu=0.0, robust=False,
                     x_traj=None):
        """Reverse Riccati recursion as ONE ``lax.scan`` (reverse=True)
        with per-step linearization inside the body.

        Ref: lqr.py:310-355.  Initializing the carry (V, v) = 0 makes the
        body uniform: at t = T-1 the F-terms vanish exactly, reproducing
        the reference's terminal special case.

        ``mu`` adds Levenberg regularization ``Quu + mu I`` before the
        Cholesky solve (Tassa et al. 2012) — the reference has no such
        term (lqr.py:310-355), which is why its vanilla iLQR diverges on
        unstable plants beyond short horizons; ``mu=0`` is exact parity.

        ``x_traj`` (``(*B, T, ns)``) supplies the nominal states directly
        instead of re-rolling ``u_traj``.  On chaotic plants a re-roll is
        NOT reproducible across separately-compiled programs (XLA fusion
        reassociates the dynamics arithmetic; 1-ulp differences amplify
        over the horizon), so the line-search loop must linearize around
        the exact trajectory whose cost it accepted — measured on the
        T=128 cartpole, re-rolling made the incumbent's own re-evaluation
        2x its accepted cost and stalled every subsequent step.
        """
        ns, nsc = x_init.shape[-1], self.p.shape[-1]
        nc = nsc - ns
        if u_traj is None:
            self.u_traj = jnp.zeros(self.n_batch + (self.T, nc),
                                    dtype=self.dtype)
        else:
            self.u_traj = jnp.asarray(u_traj)
        xb = jnp.broadcast_to(x_init, self.n_batch + (ns,))
        us_s = jnp.moveaxis(self.u_traj, -2, 0)         # (T, *B, nc)
        ts = jnp.arange(self.T)

        def roll(xt, tu):
            t, ut = tu
            xn = self._step(xt, ut, self._time(t, dt))
            if robust:
                # saturate the nominal: a diverging rollout (unstable
                # plant, long horizon) otherwise overflows f32 and every
                # downstream quantity — linearization, cost, line-search
                # comparison — becomes nan/inf, leaving the optimizer no
                # gradient signal to escape.  Inactive on sane nominals.
                xn = jnp.clip(jnp.nan_to_num(xn, nan=_XCAP, posinf=_XCAP,
                                             neginf=-_XCAP), -_XCAP, _XCAP)
            return xn, xt

        if x_traj is None:
            _, xs_s = lax.scan(roll, xb, (ts, us_s))    # (T, *B, ns)
            self.x_traj = jnp.moveaxis(xs_s, 0, -2)
        else:
            self.x_traj = jnp.asarray(x_traj)
            xs_s = jnp.moveaxis(self.x_traj, -2, 0)

        xut = jnp.concatenate([self.x_traj, self.u_traj], axis=-1)
        p = bmv(self.Q, xut) + self.p

        Qs = jnp.moveaxis(self.Q, -3, 0)                # (T, *B, nsc, nsc)
        ps = jnp.moveaxis(p, -2, 0)                     # (T, *B, nsc)

        def body(carry, inp):
            V, v = carry
            t, Qt0, pt, xt, ut = inp
            A, B = self._linearize(xt, ut, self._time(t, dt))
            F = jnp.concatenate([A, B], axis=-1)
            Ft = jnp.swapaxes(F, -1, -2)
            Qt = Qt0 + Ft @ V @ F
            qt = pt + bmv(Ft, v)
            Qxx, Qxu = Qt[..., :ns, :ns], Qt[..., :ns, ns:]
            Qux, Quu = Qt[..., ns:, :ns], Qt[..., ns:, ns:]
            qx, qu = qt[..., :ns], qt[..., ns:]
            Quu = Quu + mu * jnp.eye(nc, dtype=self.dtype)
            L = jnp.linalg.cholesky(Quu)
            Kt = -_cho_solve(L, Qux)
            kt = -_cho_solve(L, qu[..., None])[..., 0]
            KtT = jnp.swapaxes(Kt, -1, -2)
            V = Qxx + Qxu @ Kt + KtT @ Qux + KtT @ Quu @ Kt
            v = qx + bmv(Qxu, kt) + bmv(KtT, qu) + bmv(KtT @ Quu, kt)
            V = 0.5 * (V + jnp.swapaxes(V, -1, -2))
            if robust:
                # cost-to-go along a diverged NOMINAL trajectory (e.g. the
                # u=0 rollout of an unstable plant over a long horizon)
                # overflows f32 before regularization can act; saturating
                # the carry keeps the pass finite so the line search can
                # reject and re-damp.  Inactive once trajectories are sane
                # (converged V* of a stabilizable plant is moderate).
                cap = 1e12
                V = jnp.clip(jnp.nan_to_num(V, nan=cap, posinf=cap,
                                            neginf=-cap), -cap, cap)
                v = jnp.clip(jnp.nan_to_num(v, nan=cap, posinf=cap,
                                            neginf=-cap), -cap, cap)
            return (V, v), (Kt, kt)

        V0 = jnp.zeros(self.n_batch + (ns, ns), self.dtype)
        v0 = jnp.zeros(self.n_batch + (ns,), self.dtype)
        _, (Ks, ks) = lax.scan(body, (V0, v0), (ts, Qs, ps, xs_s, us_s),
                               reverse=True)
        K = jnp.moveaxis(Ks, 0, -3)
        k = jnp.moveaxis(ks, 0, -2)
        return K, k

    def lqr_forward(self, x_init, K, k, u_lower=None, u_upper=None, du=None,
                    eps=1.0, robust=False):
        """Rollout accumulating quadratic cost as ONE ``lax.scan`` carrying
        (x, cost).  Ref: lqr.py:357-380.

        ``eps`` scales the feedforward term (``u = u_ref + eps k +
        K (x - x_ref)``) for backtracking line search; ``eps=1`` is the
        reference's plain rollout.  ``robust`` saturates diverging states
        (see lqr_backward) so line-search costs stay comparable."""
        assert x_init.ndim == 2, 'Shape not compatible.'
        ts = jnp.arange(self.T)
        Ks = jnp.moveaxis(K, -3, 0)
        ks = jnp.moveaxis(k, -2, 0)
        xref = jnp.moveaxis(self.x_traj, -2, 0)
        uref = jnp.moveaxis(self.u_traj, -2, 0)
        Qs = jnp.moveaxis(self.Q, -3, 0)
        ps = jnp.moveaxis(self.p, -2, 0)

        def body(carry, inp):
            xt, cost = carry
            t, Kt, kt, xr, ur, Qt, pt = inp
            ut = bmv(Kt, xt - xr) + eps * kt + ur
            xut = jnp.concatenate([xt, ut], axis=-1)
            xn = self._step(xt, ut, t)
            if robust:
                xn = jnp.clip(jnp.nan_to_num(xn, nan=_XCAP, posinf=_XCAP,
                                             neginf=-_XCAP), -_XCAP, _XCAP)
            cost = cost + 0.5 * bvmv(xut, Qt, xut) \
                + jnp.sum(xut * pt, axis=-1)
            return (xn, cost), (xn, ut)

        cost0 = jnp.zeros(self.n_batch, dtype=self.dtype)
        (_, cost), (xn_s, us_s) = lax.scan(
            body, (x_init, cost0), (ts, Ks, ks, xref, uref, Qs, ps))
        x = jnp.concatenate([x_init[..., None, :],
                             jnp.moveaxis(xn_s, 0, -2)], axis=-2)
        u = jnp.moveaxis(us_s, 0, -2)
        return x, u, cost


_XCAP = 1e6  # robust-mode state saturation bound


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
