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

    def __init__(self, system, Q, p, T, stepper=None, line_search=False,
                 reg_init=1e-6, reg_factor=10.0, reg_min=1e-8, reg_max=1e8,
                 ls_steps=8, ls_decay=0.5):
        super().__init__()
        self.stepper = ReduceToBason(steps=10) if stepper is None else stepper
        self.stepper.max_steps -= 1
        self.lqr = LQR(system, Q, p, T)
        # Tassa-style robust iLQR (opt-in; default is reference parity):
        # Levenberg-regularized Quu in the backward pass + backtracking
        # line search on the feedforward term.  Lifts the horizon cap on
        # unstable plants (vanilla iLQR diverges on cartpole swing-up
        # beyond ~T=50; with line_search=True T=128 converges — the
        # reference, pypose/module/lqr.py:310-380, has neither device).
        self.line_search = bool(line_search)
        self.reg_init = float(reg_init)
        self.reg_factor = float(reg_factor)
        self.reg_min = float(reg_min)
        self.reg_max = float(reg_max)
        self.ls_steps = int(ls_steps)
        self.ls_decay = float(ls_decay)

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
            loop = self._iloop_ls if self.line_search else self._iloop
            self._compiled[key] = jax.jit(
                lambda x0, d, u0: loop(x0, None if dt is None else d, u0))
        # the system's time buffer ``_t`` auto-increments on forward
        # (dynamics.py:17-24 semantics); reset it to a concrete value
        # around each compiled call so no tracer leaks between traces
        self.lqr.system.reset()
        if self.line_search:
            u_best, x_nom = jax.lax.stop_gradient(
                self._compiled[key](x_init, dt_arr, u_init))
        else:
            u_best = jax.lax.stop_gradient(
                self._compiled[key](x_init, dt_arr, u_init))

        fkey = ('final', dt is None)
        if fkey not in self._compiled:
            if self.line_search:
                # linearize around the loop's CARRIED nominal (a re-roll
                # is not reproducible on chaotic plants — see
                # lqr_backward) and roll with the feedback term active:
                # the returned trajectory is then the stabilized one the
                # loop actually accepted, not an open-loop re-roll whose
                # f32 divergence grows as e^(lambda T).
                self._compiled[fkey] = jax.jit(
                    lambda x0, d, u, xn: self.lqr(
                        x0, None if dt is None else d, u_traj=u, x_traj=xn,
                        mu=self.reg_min, robust=True))
            else:
                self._compiled[fkey] = jax.jit(
                    lambda x0, d, u: self.lqr(x0, None if dt is None else d,
                                              u_traj=u))
        self.lqr.system.reset()
        if self.line_search:
            out = self._compiled[fkey](x_init, dt_arr, u_best, x_nom)
        else:
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

    def _stabilizing_init(self, x_init, dt, u_init):
        """Closed-loop seed for the robust iLQR: solve the finite-horizon
        LQR of the AFFINE linearization at (x_init, 0) (one Riccati scan),
        roll the TRUE dynamics out under that policy, and return whichever
        of (u_init, the stabilized sequence) has the lower true cost.

        Long unstable horizons make the open-loop u=0 nominal numerically
        chaotic (cartpole at T>=128 overflows f32 within the rollout), and
        iLQR cannot line-search its way out of a saturated landscape; a
        stabilizing initial policy keeps the first nominal in the sane
        region.  Standard practice (Tassa et al. use warm starts for the
        same reason).

        Returns ``(u, x_nom, cost)`` — the winning control sequence, its
        pre-step nominal states ``(*B, T, ns)``, and its per-batch cost —
        so the line-search loop can linearize around EXACTLY this
        trajectory (see lqr_backward's x_traj note on chaotic re-rolls)."""
        import jax.numpy as jnp
        from ..function.linalg import bmv, bvmv
        from .lqr import _XCAP

        lqr = self.lqr
        ns = x_init.shape[-1]
        u0 = jnp.zeros(x_init.shape[:-1] + (lqr.p.shape[-1] - ns,),
                       x_init.dtype)
        t0 = 0 if dt is None else 0.0
        A, B = lqr._linearize(x_init, u0, t0)
        f0 = lqr._step(x_init, u0, t0)
        c1 = f0 - bmv(A, x_init)                       # affine remainder
        F = jnp.concatenate([A, B], axis=-1)
        Ft = jnp.swapaxes(F, -1, -2)
        Qc = lqr.Q[..., 0, :, :]
        pc = lqr.p[..., 0, :]
        nc = lqr.p.shape[-1] - ns
        eye = jnp.eye(nc, dtype=x_init.dtype)

        def ric(carry, _):
            V, v = carry
            Qt = Qc + Ft @ V @ F
            qt = pc + bmv(Ft, bmv(V, c1) + v)
            Quu = Qt[..., ns:, ns:] + 1e-6 * eye
            Qux = Qt[..., ns:, :ns]
            Qxu = Qt[..., :ns, ns:]
            Qxx = Qt[..., :ns, :ns]
            qx, qu = qt[..., :ns], qt[..., ns:]
            Kt = -jnp.linalg.solve(Quu, Qux)
            kt = -jnp.linalg.solve(Quu, qu[..., None])[..., 0]
            KtT = jnp.swapaxes(Kt, -1, -2)
            V = Qxx + Qxu @ Kt + KtT @ Qux + KtT @ Quu @ Kt
            v = qx + bmv(Qxu, kt) + bmv(KtT, qu) + bmv(KtT @ Quu, kt)
            V = 0.5 * (V + jnp.swapaxes(V, -1, -2))
            V = jnp.clip(jnp.nan_to_num(V, nan=1e12, posinf=1e12,
                                        neginf=-1e12), -1e12, 1e12)
            v = jnp.clip(jnp.nan_to_num(v, nan=1e12, posinf=1e12,
                                        neginf=-1e12), -1e12, 1e12)
            return (V, v), (Kt, kt)

        V0 = jnp.zeros(x_init.shape[:-1] + (ns, ns), x_init.dtype)
        v0 = jnp.zeros_like(x_init)
        _, (Ks, ks) = jax.lax.scan(ric, (V0, v0), None, length=lqr.T,
                                   reverse=True)

        Qs = jnp.moveaxis(lqr.Q, -3, 0)
        ps = jnp.moveaxis(lqr.p, -2, 0)
        ts = jnp.arange(lqr.T)

        def roll(policy):
            def body(carry, inp):
                xt, cost = carry
                t, Kt, kt, ut_open, Qt, pt = inp
                ut = jnp.where(policy, bmv(Kt, xt) + kt, ut_open)
                xut = jnp.concatenate([xt, ut], axis=-1)
                xn = lqr._step(xt, ut, lqr._time(t, dt))
                xn = jnp.clip(jnp.nan_to_num(xn, nan=_XCAP, posinf=_XCAP,
                                             neginf=-_XCAP), -_XCAP, _XCAP)
                cost = cost + 0.5 * bvmv(xut, Qt, xut) \
                    + jnp.sum(xut * pt, axis=-1)
                return (xn, cost), (ut, xt)

            cost0 = jnp.zeros(lqr.n_batch, dtype=x_init.dtype)
            uo = jnp.moveaxis(u_init, -2, 0)
            (_, cost), (us, xs) = jax.lax.scan(
                body, (x_init, cost0), (ts, Ks, ks, uo, Qs, ps))
            return jnp.moveaxis(us, 0, -2), jnp.moveaxis(xs, 0, -2), cost

        u_stab, x_stab, c_stab = roll(jnp.asarray(True))
        u_open, x_open, c_open = roll(jnp.asarray(False))
        tot_stab = jnp.sum(jnp.where(jnp.isfinite(c_stab), c_stab,
                                     jnp.full_like(c_stab, jnp.inf)))
        tot_open = jnp.sum(jnp.where(jnp.isfinite(c_open), c_open,
                                     jnp.full_like(c_open, jnp.inf)))
        win = tot_stab < tot_open
        return (jnp.where(win, u_stab, u_open),
                jnp.where(win, x_stab, x_open),
                jnp.where(win, c_stab, c_open))

    def _iloop_ls(self, x_init, dt, u_init):
        """Robust iLQR loop: Levenberg-regularized backward pass +
        backtracking line search, as one ``lax.while_loop``.

        Per iteration: backward pass with ``Quu + mu I`` linearized around
        the CARRIED accepted trajectory (never re-rolled — chaotic plants
        make re-rolls irreproducible across compiled programs, see
        lqr_backward); the rollout is evaluated at ``ls_steps``
        feedforward scales ``eps = decay^i`` simultaneously (one vmapped
        scan — the candidates share the linearization, so this costs one
        rollout's HBM traffic); the best finite candidate is accepted iff
        it improves the total cost, mu shrinks on acceptance and grows on
        rejection.  Stops on the stepper criteria or when mu saturates at
        reg_max."""
        st = self.stepper
        u0, x_nom0, c0 = self._stabilizing_init(x_init, dt, u_init)
        epss = jnp.asarray([self.ls_decay ** i for i in range(self.ls_steps)],
                           x_init.dtype)

        def cond(carry):
            return ~carry[-1]

        def body(carry):
            u, x_nom, last, steps, pat, mu, _ = carry
            K, k = self.lqr.lqr_backward(x_init, dt, u_traj=u, mu=mu,
                                         robust=True, x_traj=x_nom)
            finite_b = jnp.all(jnp.isfinite(K)) & jnp.all(jnp.isfinite(k))
            K = jnp.nan_to_num(K)
            k = jnp.nan_to_num(k)

            def try_eps(e):
                x_new, u_new, cost = self.lqr.lqr_forward(
                    x_init, K, k, eps=e, robust=True)
                return x_new, u_new, cost

            xs, us, costs = jax.vmap(try_eps)(epss)    # (L, *B, T, ·), (L, *B)
            tot = jnp.sum(costs.reshape(self.ls_steps, -1), axis=-1)
            tot = jnp.where(jnp.isfinite(tot), tot, jnp.inf)
            i = jnp.argmin(tot)
            u_new = jnp.take(us, i, axis=0)
            # pre-step nominal of the winning rollout (lqr_forward's x is
            # (x0, x1..xT); drop xT)
            x_new = jnp.take(xs, i, axis=0)[..., :-1, :]
            cost = jnp.take(costs, i, axis=0)
            last_tot = jnp.sum(jnp.where(jnp.isfinite(last), last,
                                         jnp.full_like(last, jnp.inf)))
            accept = finite_b & jnp.isfinite(tot[i]) & (tot[i] < last_tot)
            u = jnp.where(accept, u_new, u)
            x_nom = jnp.where(accept, x_new, x_nom)
            cost_eff = jnp.where(accept, cost, last)
            mu = jnp.where(accept,
                           jnp.maximum(mu / self.reg_factor, self.reg_min),
                           jnp.minimum(mu * self.reg_factor, self.reg_max))
            steps = steps + 1
            stop = jnp.all(cost_eff < st.tol) | (steps >= st.max_steps)
            plateau = accept & jnp.all(
                (last - cost_eff) / jnp.abs(cost_eff) < st.decreasing)
            pat = jnp.where(plateau, pat + 1, jnp.zeros_like(pat))
            stop = stop | (pat >= st.patience) | (~accept & (mu >= self.reg_max))
            return (u, x_nom, cost_eff, steps, pat, mu, stop)

        i0 = jnp.asarray(0, jnp.int32)
        mu0 = jnp.asarray(self.reg_init, x_init.dtype)
        # acceptance is monotone in total cost, so the carried (u, x_nom)
        # IS the best-so-far pair — no separate best_u tracking needed
        carry = (u0, x_nom0, c0, i0, i0, mu0, jnp.asarray(False))
        u, x_nom = jax.lax.while_loop(cond, body, carry)[:2]
        return u, x_nom

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
