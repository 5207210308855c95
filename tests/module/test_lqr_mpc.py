"""LQR / MPC tests: LTI-LQR matches an independently-computed Riccati
solution; MPC on a nonlinear system reduces cost.  Ref style:
tests/module/test_lqr.py (hard-coded analytic references).
"""

import jax
import jax.numpy as jnp
import numpy as np

import pypose_tpu as pp
from pypose_tpu.module import LTI, NLS, LQR, MPC
from pypose_tpu.utils import ReduceToBason


def _np_lqr(A, B, Q, p, T, x0):
    """Independent numpy Riccati reference for LTI dynamics."""
    ns, nc = A.shape[-1], B.shape[-1]
    K = [None] * T
    k = [None] * T
    V = v = None
    # nominal traj = rollout with zero input from x0
    x_traj = [x0]
    for t in range(T - 1):
        x_traj.append(A @ x_traj[-1])
    for t in range(T - 1, -1, -1):
        if t == T - 1:
            Qt, qt = Q, p + Q @ np.concatenate([x_traj[t], np.zeros(nc)])
        else:
            F = np.concatenate([A, B], axis=-1)
            Qt = Q + F.T @ V @ F
            qt = p + Q @ np.concatenate([x_traj[t], np.zeros(nc)]) + F.T @ v
        Qxx, Qxu = Qt[:ns, :ns], Qt[:ns, ns:]
        Qux, Quu = Qt[ns:, :ns], Qt[ns:, ns:]
        qx, qu = qt[:ns], qt[ns:]
        K[t] = -np.linalg.solve(Quu, Qux)
        k[t] = -np.linalg.solve(Quu, qu)
        V = Qxx + Qxu @ K[t] + K[t].T @ Qux + K[t].T @ Quu @ K[t]
        v = qx + Qxu @ k[t] + K[t].T @ qu + K[t].T @ Quu @ k[t]
    # rollout
    xs, us = [x0], []
    cost = 0.0
    xt = x0
    for t in range(T):
        dx = xt - x_traj[t]
        ut = K[t] @ dx + k[t]
        xu = np.concatenate([xt, ut])
        cost += 0.5 * xu @ Q @ xu + p @ xu
        xt = A @ xt + B @ ut
        xs.append(xt)
        us.append(ut)
    return np.stack(xs), np.stack(us), cost


def test_lqr_matches_numpy_riccati():
    rng = np.random.default_rng(0)
    ns, nc, T = 3, 2, 5
    A = np.eye(ns) + 0.1 * rng.normal(size=(ns, ns))
    B = rng.normal(size=(ns, nc))
    C = np.eye(ns)
    D = np.zeros((ns, nc))
    Qm = rng.normal(size=(ns + nc, ns + nc))
    Qm = Qm @ Qm.T + (ns + nc) * np.eye(ns + nc)
    p = rng.normal(size=(ns + nc,))
    x0 = rng.normal(size=(ns,))

    sys = LTI(jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32),
              jnp.asarray(C, jnp.float32), jnp.asarray(D, jnp.float32))
    Q = jnp.asarray(Qm, jnp.float32)[None]
    pv = jnp.asarray(p, jnp.float32)[None]
    lqr = LQR(sys, Q, pv, T)
    x, u, cost = lqr(jnp.asarray(x0, jnp.float32)[None])

    x_ref, u_ref, cost_ref = _np_lqr(A, B, Qm, p, T, x0)
    np.testing.assert_allclose(np.asarray(x)[0], x_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(u)[0], u_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(cost[0]), cost_ref, rtol=1e-3)


class CartPoleLike(NLS):
    """Simple pendulum-ish nonlinear system."""

    def state_transition(self, state, input, t=None):
        th, om = state[..., 0], state[..., 1]
        dt = 0.05
        om_new = om + dt * (jnp.sin(th) + input[..., 0])
        th_new = th + dt * om_new
        return jnp.stack([th_new, om_new], axis=-1)

    def observation(self, state, input, t=None):
        return state


def test_mpc_reduces_cost():
    sys = CartPoleLike()
    T = 10
    ns, nc = 2, 1
    Q = jnp.eye(ns + nc)[None]
    p = jnp.zeros((1, ns + nc))
    stepper = ReduceToBason(steps=4, verbose=False)
    mpc = MPC(sys, Q, p, T, stepper=stepper)
    x0 = jnp.array([[0.5, 0.0]])
    x, u, cost = mpc(0.05, x0)
    assert x.shape == (1, T + 1, ns)
    assert u.shape == (1, T, nc)
    # zero-input cost for comparison
    xt = x0
    c0 = 0.0
    for t in range(T):
        xu = jnp.concatenate([xt, jnp.zeros((1, nc))], axis=-1)
        c0 += 0.5 * pp.bvmv(xu, Q[0], xu) + jnp.sum(xu * p)
        xt = sys.state_transition(xt, jnp.zeros((1, nc)))
    assert float(cost[0]) <= float(c0[0]) + 1e-6


def test_lqr_long_horizon_scan():
    """T=256 NLS-LQR must compile fast (scan: O(1) programs in T — the
    unrolled version took minutes) and produce finite trajectories."""
    import time
    sys = CartPoleLike()
    T = 256
    ns, nc = 2, 1
    Q = jnp.tile(jnp.eye(ns + nc)[None, None], (1, T, 1, 1))
    p = jnp.zeros((1, T, ns + nc))
    lqr = LQR(sys, Q, p, T)
    x0 = jnp.array([[0.3, 0.0]])
    t0 = time.perf_counter()
    run = jax.jit(lambda x: lqr(x))
    x, u, cost = run(x0)
    jax.block_until_ready(cost)
    elapsed = time.perf_counter() - t0
    assert elapsed < 60.0, f'T=256 LQR compile took {elapsed:.1f}s'
    assert x.shape == (1, T + 1, ns) and u.shape == (1, T, nc)
    assert bool(jnp.isfinite(cost).all()) and bool(jnp.isfinite(x).all())


def test_lqr_time_varying_cost_scan():
    """Per-step (time-varying) Q/p enter the scan as stacked xs; a
    terminal-weighted cost must steer the final state toward zero harder
    than a uniform one."""
    sys = CartPoleLike()
    T = 30
    ns, nc = 2, 1
    Q_unif = jnp.tile(jnp.eye(ns + nc)[None, None], (1, T, 1, 1))
    Q_term = Q_unif.at[:, -1].mul(100.0)
    p = jnp.zeros((1, T, ns + nc))
    x0 = jnp.array([[0.6, 0.0]])
    x_u, _, _ = LQR(sys, Q_unif, p, T)(x0)
    x_t, _, _ = LQR(sys, Q_term, p, T)(x0)
    assert float(jnp.abs(x_t[0, -2]).sum()) < float(jnp.abs(x_u[0, -2]).sum())


class _CartPoleFull(NLS):
    """True cart-pole (unstable upright equilibrium), Euler-discretized —
    the reference's MPC example plant (examples/module/mpc/cartpole.py)."""

    def state_transition(self, state, input, t=None):
        x, dx, th, dth = (state[..., 0], state[..., 1],
                          state[..., 2], state[..., 3])
        f = input[..., 0]
        dtt, g, mc, mp, l = 0.05, 9.81, 1.0, 0.1, 0.5
        tmp = (f + mp * l * dth ** 2 * jnp.sin(th)) / (mc + mp)
        thacc = (g * jnp.sin(th) - jnp.cos(th) * tmp) / \
            (l * (4.0 / 3 - mp * jnp.cos(th) ** 2 / (mc + mp)))
        xacc = tmp - mp * l * thacc * jnp.cos(th) / (mc + mp)
        return jnp.stack([x + dtt * dx, dx + dtt * xacc,
                          th + dtt * dth, dth + dtt * thacc], axis=-1)

    def observation(self, state, input, t=None):
        return state


def test_mpc_line_search_long_horizon():
    """Robust (regularized + line-search) iLQR converges on the unstable
    cart-pole at T=128 — vanilla iLQR (reference parity,
    /root/reference/pypose/module/lqr.py:310-380) diverges beyond ~T=50.
    Pins the carried-nominal design: the backward pass must linearize
    around the accepted forward-pass trajectory (re-rolls are not
    f32-reproducible on chaotic plants) and the returned trajectory rolls
    with feedback active."""
    T = 128
    Q = jnp.diag(jnp.array([1., 0.1, 10., 0.1, 0.01]))[None]
    p = jnp.zeros((1, 5))
    mpc = MPC(_CartPoleFull(), Q, p, T,
              stepper=ReduceToBason(steps=30), line_search=True)
    x0 = jnp.array([[0.0, 0.0, 0.3, 0.0]])
    x, u, cost = mpc(0.05, x0)
    assert x.shape == (1, T + 1, 4) and u.shape == (1, T, 1)
    assert bool(jnp.isfinite(cost).all()) and bool(jnp.isfinite(x).all())
    # swing-up succeeds: pole settles near upright over the back half
    assert float(cost[0]) < 50.0, f'cost {float(cost[0])}'
    assert float(jnp.abs(x[0, T // 2:, 2]).max()) < 0.1
