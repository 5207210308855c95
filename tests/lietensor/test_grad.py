"""AD tests for the analytic left-trivialized tangent rules.

Checks: the reference's gradient convention (tangent gradient padded with a
zero tail in storage shape), jacrev/jacfwd agreement, composition with
vmap/jit, and finite-difference validation of every op's JVP in the
left-perturbation sense.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pypose_tpu as pp
from pypose_tpu.lietensor.jacobian import so3_Jl_inv, se3_Jl_inv


GROUPS = [
    (pp.randn_SO3, pp.randn_so3, 4, 3),
    (pp.randn_SE3, pp.randn_se3, 7, 6),
    (pp.randn_RxSO3, pp.randn_rxso3, 5, 4),
    (pp.randn_Sim3, pp.randn_sim3, 8, 7),
]


def key(i=0):
    return jax.random.PRNGKey(i)


def left_perturb(X, delta_man, eps):
    """Exp(eps * delta) * X with delta a manifold tangent."""
    alg = X.Log().ltype
    return pp.LieTensor(eps * delta_man, ltype=alg).Exp() @ X


def fd_directional(f, X, delta_man, eps=1e-3):
    """Central finite difference of f along a left perturbation of X."""
    hi = f(left_perturb(X, delta_man, eps))
    lo = f(left_perturb(X, delta_man, -eps))
    return (np.asarray(hi) - np.asarray(lo)) / (2 * eps)


@pytest.mark.parametrize('randn_G,randn_g,dim,man', GROUPS)
def test_grad_zero_tail(randn_G, randn_g, dim, man):
    """Gradient of a group LieTensor lives in tangent dims, zero tail.

    Ref convention: operation.py backward rules append a zero column.
    """
    X = randn_G(4, key=key(1))

    def loss(X):
        return jnp.sum(X.Log().tensor() ** 2)

    g = jax.grad(loss)(X)
    assert isinstance(g, pp.LieTensor)
    assert g.shape == (4, dim)
    np.testing.assert_allclose(np.asarray(g.tensor()[..., man:]), 0.0)


@pytest.mark.parametrize('randn_G,randn_g,dim,man', GROUPS)
@pytest.mark.parametrize('op', ['Log', 'Inv', 'Act', 'Act4', 'Mul_left',
                                'Mul_right', 'Adj', 'AdjT'])
def test_jvp_matches_finite_difference(randn_G, randn_g, dim, man, op):
    # sim3's Jl/Jl_inv are exact (scaling-and-squaring on the adjoint
    # integral) — unlike the reference's truncated series
    # (operation.py:159-172), no radius cap is needed.
    sigma = 0.8
    X = randn_G(3, sigma=sigma, key=key(2))
    Y = randn_G(3, sigma=sigma, key=key(3))
    p3 = jax.random.normal(key(4), (3, 3))
    p4 = jnp.concatenate([p3, jnp.ones((3, 1))], axis=-1)
    a = jax.random.normal(key(5), (3, man)) * 0.5
    delta = jax.random.normal(key(6), (3, man))

    fns = {
        'Log': lambda Z: Z.Log().tensor(),
        'Inv': lambda Z: Z.Inv().Log().tensor(),
        'Act': lambda Z: Z.Act(p3),
        'Act4': lambda Z: Z.Act(p4),
        'Mul_left': lambda Z: (Z @ Y).Log().tensor(),
        'Mul_right': lambda Z: (Y @ Z).Log().tensor(),
        'Adj': lambda Z: Z.Adj(a).tensor(),
        'AdjT': lambda Z: Z.AdjT(a).tensor(),
    }
    f = fns[op]

    # analytic JVP along the left-perturbation curve t -> Exp(t delta) X,
    # expressed through the + retraction (storage-embedded tangent)
    dX = jnp.concatenate([delta, jnp.zeros((3, dim - man))], axis=-1)
    _, analytic = jax.jvp(lambda d: f(X + d), (jnp.zeros_like(dX),), (dX,))
    numeric = fd_directional(f, X, delta)
    np.testing.assert_allclose(np.asarray(analytic), numeric,
                               rtol=1e-2, atol=2e-3)


@pytest.mark.parametrize('randn_G,randn_g,dim,man', GROUPS)
def test_exp_jvp_fd(randn_G, randn_g, dim, man):
    sigma = 0.6
    x = randn_g(3, sigma=sigma, key=key(7))
    dx = jax.random.normal(key(8), (3, man))
    out, tan = jax.jvp(lambda v: pp.LieTensor(v, ltype=x.ltype).Exp().tensor(),
                       (x.tensor(),), (dx,))
    # finite difference in the left-trivialized sense:
    # d = d/dt Log(Exp(x + t dx) * Exp(x)^-1)
    eps = 1e-3
    X0 = x.Exp()
    hi = (pp.LieTensor(x.tensor() + eps * dx, ltype=x.ltype).Exp()
          @ X0.Inv()).Log().tensor()
    lo = (pp.LieTensor(x.tensor() - eps * dx, ltype=x.ltype).Exp()
          @ X0.Inv()).Log().tensor()
    fd = (np.asarray(hi) - np.asarray(lo)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(tan[..., :man]), fd,
                               rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(tan[..., man:]), 0.0)


def test_log_grad_analytic():
    """grad sum(Log(X)) == Jl_inv(Log X)^T @ 1, padded.  SO3 and SE3."""
    X = pp.randn_SO3(4, key=key(9))
    g = jax.grad(lambda X: X.Log().tensor().sum())(X)
    expect = jnp.einsum('nij,ni->nj', so3_Jl_inv(X.Log().tensor()),
                        jnp.ones((4, 3)))
    np.testing.assert_allclose(np.asarray(g.tensor()[..., :3]),
                               np.asarray(expect), atol=1e-5)

    E = pp.randn_SE3(4, key=key(10))
    gE = jax.grad(lambda X: X.Log().tensor().sum())(E)
    expectE = jnp.einsum('nij,ni->nj', se3_Jl_inv(E.Log().tensor()),
                         jnp.ones((4, 6)))
    np.testing.assert_allclose(np.asarray(gE.tensor()[..., :6]),
                               np.asarray(expectE), atol=1e-5)


def test_jacrev_jacfwd_agree():
    X = pp.randn_SE3(2, key=key(11))
    p = jax.random.normal(key(12), (2, 3))

    def f(data):
        return pp.SE3(data).Act(p)

    Jr = jax.jacrev(f)(X.tensor())
    Jf = jax.jacfwd(f)(X.tensor())
    np.testing.assert_allclose(np.asarray(Jr), np.asarray(Jf), atol=1e-5)


def test_grad_through_scan_and_vmap():
    X = pp.randn_SO3(6, key=key(13))

    def loss(X):
        def step(carry, x):
            return carry @ x, None
        final, _ = jax.lax.scan(step, pp.identity_SO3(), X)
        return jnp.sum(final.Log().tensor() ** 2)

    g = jax.jit(jax.grad(loss))(X)
    assert g.shape == (6, 4)
    # FD check on one direction
    delta = jax.random.normal(key(14), (6, 3))
    dX = jnp.concatenate([delta, jnp.zeros((6, 1))], axis=-1)
    eps = 1e-3

    def perturb(t):
        return pp.so3(t * delta).Exp() @ X

    fd = (loss(perturb(eps)) - loss(perturb(-eps))) / (2 * eps)
    analytic = jnp.sum(g.tensor() * dX)
    np.testing.assert_allclose(np.asarray(analytic), np.asarray(fd),
                               rtol=2e-2, atol=1e-3)


def test_second_order_does_not_nan():
    """Hessian-vector products through Exp/Log stay finite (double-where)."""
    x = pp.randn_so3(3, sigma=0.5, key=key(15)).tensor()

    def loss(v):
        return jnp.sum(pp.so3(v).Exp().Log().tensor() ** 2)

    h = jax.grad(lambda v: jnp.sum(jax.grad(loss)(v) ** 2))(x)
    assert np.isfinite(np.asarray(h)).all()
    # also at exactly zero
    h0 = jax.grad(lambda v: jnp.sum(jax.grad(loss)(v) ** 2))(
        jnp.zeros((3, 3)))
    assert np.isfinite(np.asarray(h0)).all()


def test_sim3_jl_exact_wide_tangent():
    """sim3_Jl/Jl_inv are exact at large tangent norms (the reference's
    truncated series, operation.py:159-172, degrades past ~0.5): FD-check
    Sim3 Exp/Log JVPs at tangent norm ~2 in f64, and pin the defining
    identities exp(ad) = I + ad @ Jl, Jl @ Jl_inv = I."""
    from pypose_tpu.lietensor.jacobian import sim3_Jl, sim3_Jl_inv, sim3_adj
    import jax

    with jax.enable_x64(True):
        rng = np.random.default_rng(12)
        x = rng.normal(size=(5, 7))
        x = x / np.linalg.norm(x, axis=-1, keepdims=True) * 2.0
        xj = jnp.asarray(x)

        J = np.asarray(sim3_Jl(xj))
        Jinv = np.asarray(sim3_Jl_inv(xj))
        eye = np.broadcast_to(np.eye(7), (5, 7, 7))
        np.testing.assert_allclose(J @ Jinv, eye, atol=1e-12)

        # exp(ad) = I + ad @ Jl (defining identity of the left Jacobian)
        ad = np.asarray(sim3_adj(xj))
        expm_ref = np.stack([_np_expm(a) for a in ad])
        np.testing.assert_allclose(eye + ad @ J, expm_ref, atol=1e-10)

        # FD check of the Exp JVP at norm 2
        alg = pp.sim3(xj)
        dx = jnp.asarray(rng.normal(size=(5, 7)))
        _, tan = jax.jvp(lambda v: pp.sim3(v).Exp().tensor(), (xj,), (dx,))
        eps = 1e-6
        X0 = alg.Exp()
        hi = (pp.sim3(xj + eps * dx).Exp() @ X0.Inv()).Log().tensor()
        lo = (pp.sim3(xj - eps * dx).Exp() @ X0.Inv()).Log().tensor()
        fd = (np.asarray(hi) - np.asarray(lo)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(tan[..., :7]), fd,
                                   rtol=1e-5, atol=1e-6)


def _np_expm(a, terms=60):
    """Series matrix exponential with scaling-and-squaring (independent of
    jax; avoids a scipy dependency)."""
    n = 8
    b = a / 2.0 ** n
    acc = np.eye(a.shape[0])
    term = np.eye(a.shape[0])
    for k in range(1, terms):
        term = term @ b / k
        acc = acc + term
    for _ in range(n):
        acc = acc @ acc
    return acc
