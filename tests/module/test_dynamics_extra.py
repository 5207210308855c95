"""LTV dynamics, runsys, Jr, and func.jacrev cross-implementation tests."""

import jax
import jax.numpy as jnp
import numpy as np

import pypose_tpu as pp
from pypose_tpu.module import LTV, LTI
from pypose_tpu.module.dynamics import runsys, toBTN


class Periodic(LTV):
    """A(t) switches sign with time via property override."""

    def __init__(self):
        A = jnp.eye(2)
        B = jnp.zeros((2, 1))
        C = jnp.eye(2)
        D = jnp.zeros((2, 1))
        super().__init__(A, B, C, D)

    @property
    def A(self):
        sign = 1.0 - 2.0 * (self.systime % 2)
        return sign * self._A


def test_ltv_time_varying():
    sys = Periodic()
    x = jnp.array([1.0, 2.0])
    u = jnp.zeros(1)
    x1, _ = sys(x, u)       # t=0: +I
    np.testing.assert_allclose(np.asarray(x1), [1., 2.], atol=1e-6)
    x2, _ = sys(x1, u)      # t=1: -I
    np.testing.assert_allclose(np.asarray(x2), [-1., -2.], atol=1e-6)
    sys.set_refpoint(t=0)
    assert int(sys.systime) == 0


def test_runsys_and_toBTN():
    A = 0.5 * jnp.eye(2)
    sys = LTI(A, jnp.eye(2), jnp.eye(2), jnp.zeros((2, 2)))
    x0 = jnp.ones((1, 1, 2))
    u = jnp.zeros((1, 4, 2))
    traj = runsys(sys, 4, x0, u)
    np.testing.assert_allclose(np.asarray(traj[0, :, 0]),
                               [1.0, 0.5, 0.25, 0.125], atol=1e-6)
    assert toBTN(jnp.ones(2), 3).shape == (1, 3, 2)


def test_jr_so3():
    """Jr(x) == Jl(-x); and Jr at 0 == I."""
    from pypose_tpu.lietensor.jacobian import so3_Jl
    x = pp.randn_so3(4, key=jax.random.PRNGKey(0))
    Jr = x.Jr()
    np.testing.assert_allclose(np.asarray(Jr),
                               np.asarray(so3_Jl(-x.tensor())), atol=1e-6)
    J0 = pp.identity_so3(2).Jr()
    np.testing.assert_allclose(np.asarray(J0),
                               np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-6)
    # group-level Jr goes through Log
    X = pp.randn_SO3(4, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(X.Jr()),
                               np.asarray(X.Log().Jr()), atol=1e-6)


def test_func_jacrev_cross_impl():
    """pp.func.jacrev == jax.jacrev over LieTensor inputs, ltype kept.

    Ref oracle style: tests/optim/test_jacobian.py:20-60.
    """
    X = pp.randn_SO3(3, key=jax.random.PRNGKey(2))
    p = jax.random.normal(jax.random.PRNGKey(3), (3, 3))

    def f(X):
        return X.Act(p)

    J1 = pp.func.jacrev(f)(X)
    J2 = jax.jacrev(f)(X)
    assert isinstance(J1, pp.LieTensor)
    np.testing.assert_allclose(np.asarray(J1.tensor()),
                               np.asarray(J2.tensor()), atol=1e-6)
    # retain_ltype context is a no-op and does not leak
    with pp.retain_ltype():
        J3 = pp.func.jacrev(f)(X)
    np.testing.assert_allclose(np.asarray(J3.tensor()),
                               np.asarray(J1.tensor()), atol=1e-6)


def test_psjac_marker():
    from pypose_tpu.autograd import psjac

    @psjac
    def residual(x):
        return x * 2

    assert residual.__row_independent__
    np.testing.assert_allclose(np.asarray(residual(jnp.ones(3))), 2.0)
