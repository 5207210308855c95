r"""Model Predictive Control via iterative LQR.

Ref: pypose/module/mpc.py.  Iterates LQR to convergence without gradients
(stop_gradient), then runs one differentiable LQR pass (mpc.py:206-239).

TPU-native design: the reference's Python iLQR loop dispatches every LQR
op eagerly each iteration; here the whole no-grad loop (LQR inlined,
ReduceToBason stepper semantics on device, best-trajectory tracking) is
ONE cached jitted ``lax.while_loop`` program, and the final
differentiable pass is a second cached jit.  Gradients flow through the
final pass only, exactly like the reference.
"""

import jax
import jax.numpy as jnp

from ..nn import Module
from ..utils.stepper import ReduceToBason
from .lqr import LQR


class MPC(Module):
    r"""Model Predictive Control by iLQR: re-linearize the (nonlinear)
    system about the current trajectory and solve an LQR subproblem until
    the :class:`ReduceToBason` stepper converges, then run one final
    differentiable LQR pass so gradients flow to system/cost parameters
    (the reference's structure, pypose/module/mpc.py:206-239).  The iLQR
    iteration runs on device as a cached jitted ``lax.while_loop``.

    Ref: pypose/module/mpc.py:7-239 (forward :206).

    Example:
        >>> import jax.numpy as jnp
        >>> from pypose_tpu.module import LTI, MPC
        >>> ns, nc, T = 2, 1, 4
        >>> sys = LTI(jnp.eye(ns), jnp.ones((ns, nc)), jnp.eye(ns),
        ...           jnp.zeros((ns, nc)))
        >>> Q = jnp.eye(ns + nc)[None]
        >>> p = jnp.zeros(ns + nc)[None]
        >>> mpc = MPC(sys, Q, p, T)
        >>> x, u, cost = mpc(None, jnp.ones(ns)[None])
        >>> u.shape
        (1, 4, 1)
    """

    def __init__(self, system, Q, p, T, stepper=None):
        super().__init__()
        self.stepper = ReduceToBason(steps=10) if stepper is None else stepper
        self.stepper.max_steps -= 1
        self.lqr = LQR(system, Q, p, T)

    def forward(self, dt, x_init, u_init=None, u_lower=None, u_upper=None,
                du=None):
        ns = x_init.shape[-1]
        nc = self.lqr.p.shape[-1] - ns
        if u_init is None:
            u_init = jnp.zeros(self.lqr.n_batch + (self.lqr.T, nc),
                               dtype=x_init.dtype)
        else:
            u_init = jnp.asarray(u_init)
        if self.stepper.verbose:
            return self._forward_host(dt, x_init, u_init)

        dt_arr = (jnp.asarray(0.0, x_init.dtype) if dt is None
                  else jnp.asarray(dt, x_init.dtype))
        if not hasattr(self, '_compiled'):
            self._compiled = {}
        key = ('loop', dt is None)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                lambda x0, d, u0: self._iloop(x0, None if dt is None else d,
                                              u0))
        # the system's time buffer ``_t`` auto-increments on forward
        # (dynamics.py:17-24 semantics); reset it to a concrete value
        # around each compiled call so no tracer leaks between traces
        self.lqr.system.reset()
        u_best = jax.lax.stop_gradient(
            self._compiled[key](x_init, dt_arr, u_init))

        fkey = ('final', dt is None)
        if fkey not in self._compiled:
            self._compiled[fkey] = jax.jit(
                lambda x0, d, u: self.lqr(x0, None if dt is None else d,
                                          u_traj=u))
        self.lqr.system.reset()
        out = self._compiled[fkey](x_init, dt_arr, u_best)
        self.lqr.system.reset()
        return out

    def _iloop(self, x_init, dt, u_init):
        """No-grad iLQR iterations as a lax.while_loop; returns the best
        input trajectory under the stepper's stop criteria."""
        st = self.stepper
        batch = self.lqr.n_batch

        def cond(carry):
            return ~carry[-1]

        def body(carry):
            u, best_u, best_c, last, steps, pat, _ = carry
            _, u_new, cost = self.lqr(x_init, dt, u_traj=u)
            better = jnp.all(cost < best_c)
            best_u = jnp.where(better, u_new, best_u)
            best_c = jnp.where(better, cost, best_c)
            steps = steps + 1
            stop = jnp.all(cost < st.tol) | (steps >= st.max_steps)
            plateau = jnp.all((last - cost) / cost < st.decreasing)
            pat = jnp.where(plateau, pat + 1, jnp.zeros_like(pat))
            stop = stop | (pat >= st.patience)
            return (u_new, best_u, best_c, cost, steps, pat, stop)

        inf = jnp.full(batch, jnp.inf, dtype=x_init.dtype)
        i0 = jnp.asarray(0, jnp.int32)
        carry = (u_init, u_init, inf, inf, i0, i0, jnp.asarray(False))
        _, best_u, _, _, _, _, _ = jax.lax.while_loop(cond, body, carry)
        return best_u

    def _forward_host(self, dt, x_init, u_init):
        """Printing host loop for verbose steppers (one sync/iteration)."""
        x, u = None, u_init
        best = {'u': u, 'cost': None}
        self.stepper.reset()
        while self.stepper.continual():
            x, u, cost = jax.lax.stop_gradient(
                self.lqr(jax.lax.stop_gradient(x_init), dt, u))
            self.stepper.step(cost)
            if best['cost'] is None or bool((cost < best['cost']).all()):
                best = {'u': u, 'cost': cost}
        return self.lqr(x_init, dt, u_traj=best['u'])
