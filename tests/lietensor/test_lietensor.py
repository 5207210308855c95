"""Identity-based oracles for the Lie core, mirroring the reference's test
style (tests/lietensor/test_lietensor.py): group axioms, Exp/Log roundtrips,
Adj identities, action consistency — checked for all four group families.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pypose_tpu as pp


GROUPS = [
    (pp.randn_SO3, pp.randn_so3, pp.identity_SO3, 4, 3),
    (pp.randn_SE3, pp.randn_se3, pp.identity_SE3, 7, 6),
    (pp.randn_RxSO3, pp.randn_rxso3, pp.identity_RxSO3, 5, 4),
    (pp.randn_Sim3, pp.randn_sim3, pp.identity_Sim3, 8, 7),
]


def key(i=0):
    return jax.random.PRNGKey(i)


@pytest.mark.parametrize('randn_G,randn_g,identity_G,dim,man', GROUPS)
def test_exp_log_roundtrip(randn_G, randn_g, identity_G, dim, man):
    x = randn_g(5, sigma=0.7, key=key(1))
    X = x.Exp()
    assert X.shape == (5, dim)
    pp.testing.assert_close(X.Log().tensor(), x.tensor(), atol=1e-5)


@pytest.mark.parametrize('randn_G,randn_g,identity_G,dim,man', GROUPS)
def test_group_axioms(randn_G, randn_g, identity_G, dim, man):
    a = randn_G(4, key=key(2))
    b = randn_G(4, key=key(3))
    c = randn_G(4, key=key(4))
    I = identity_G(4)
    # associativity
    pp.testing.assert_close((a @ b) @ c, a @ (b @ c), atol=1e-5)
    # identity
    pp.testing.assert_close(a @ I, a, atol=1e-6)
    pp.testing.assert_close(I @ a, a, atol=1e-6)
    # inverse
    pp.testing.assert_close(a @ a.Inv(), I, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray((a @ b).Inv().tensor()),
        np.asarray((b.Inv() @ a.Inv()).tensor()), atol=1e-5)


@pytest.mark.parametrize('randn_G,randn_g,identity_G,dim,man', GROUPS)
def test_act_matches_matrix(randn_G, randn_g, identity_G, dim, man):
    X = randn_G(6, key=key(5))
    p = jax.random.normal(key(6), (6, 3))
    M = X.matrix()
    if M.shape[-1] == 3:
        expect = jnp.einsum('nij,nj->ni', M, p)
    else:
        expect = jnp.einsum('nij,nj->ni', M[..., :3, :3], p) + M[..., :3, 3]
    np.testing.assert_allclose(np.asarray(X.Act(p)), np.asarray(expect),
                               atol=1e-5)
    # homogeneous action
    p4 = jnp.concatenate([p, jnp.ones((6, 1))], axis=-1)
    out4 = X.Act(p4)
    np.testing.assert_allclose(np.asarray(out4[..., :3]),
                               np.asarray(X.Act(p)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out4[..., 3]), 1.0, atol=1e-6)
    # X @ p == Act
    np.testing.assert_allclose(np.asarray(X @ p), np.asarray(X.Act(p)),
                               atol=1e-6)


@pytest.mark.parametrize('randn_G,randn_g,identity_G,dim,man', GROUPS)
def test_adj_identities(randn_G, randn_g, identity_G, dim, man):
    """X * Exp(a) == Exp(Adj(X, a)) * X; Exp(a) * X == X * Exp(AdjT(X, a)).

    Ref oracle: tests/lietensor/test_lietensor.py:75-118.
    """
    X = randn_G(4, key=key(7))
    a = randn_g(4, sigma=0.4, key=key(8))
    lhs = X @ a.Exp()
    rhs = X.Adj(a).Exp() @ X
    pp.testing.assert_close(lhs, rhs, atol=1e-5)
    lhs2 = a.Exp() @ X
    rhs2 = X @ X.AdjT(a).Exp()
    pp.testing.assert_close(lhs2, rhs2, atol=1e-5)
    # Adj(X^-1, Adj(X, a)) == a
    back = X.Inv().Adj(X.Adj(a))
    np.testing.assert_allclose(np.asarray(back.tensor()),
                               np.asarray(a.tensor()), atol=1e-5)


@pytest.mark.parametrize('randn_G,randn_g,identity_G,dim,man', GROUPS)
def test_retr_add(randn_G, randn_g, identity_G, dim, man):
    X = randn_G(3, key=key(9))
    a = randn_g(3, sigma=0.3, key=key(10))
    pp.testing.assert_close(X.Retr(a), a.Exp() @ X, atol=1e-6)
    # + retraction with storage-padded delta (gradient convention)
    delta = jnp.concatenate(
        [a.tensor(), jnp.zeros(a.lshape + (dim - man,))], axis=-1)
    pp.testing.assert_close(X + delta, a.Exp() @ X, atol=1e-6)


@pytest.mark.parametrize('randn_G,randn_g,identity_G,dim,man', GROUPS)
def test_jinvp(randn_G, randn_g, identity_G, dim, man):
    """Jinvp(X, Jl(Log(X)) p) == p via the Exp differential identity."""
    X = randn_G(5, sigma=0.5, key=key(11))
    p = jax.random.normal(key(12), (5, man))
    out = X.Jinvp(p)
    assert out.ltype.on_manifold
    # inverse consistency: Jinvp is J_l^{-1}(Log X) @ p; apply J_l back.
    x = X.Log()
    # first-order identity: Exp(Log(X) + t*Jinvp(X, p)) ~ Exp(t p) * X
    eps = 1e-2
    X2 = pp.LieTensor(x.tensor() + eps * out.tensor(), ltype=x.ltype).Exp()
    X3 = pp.LieTensor(eps * p, ltype=x.ltype).Exp() @ X
    err = (X2.Inv() @ X3).Log().tensor() / eps
    np.testing.assert_allclose(np.asarray(err),
                               np.zeros_like(np.asarray(err)),
                               atol=5e-2)


def test_identity_values():
    np.testing.assert_array_equal(np.asarray(pp.identity_SO3().tensor()),
                                  [0., 0., 0., 1.])
    np.testing.assert_array_equal(np.asarray(pp.identity_SE3().tensor()),
                                  [0., 0., 0., 0., 0., 0., 1.])
    np.testing.assert_array_equal(np.asarray(pp.identity_RxSO3().tensor()),
                                  [0., 0., 0., 1., 1.])
    np.testing.assert_array_equal(np.asarray(pp.identity_Sim3().tensor()),
                                  [0., 0., 0., 0., 0., 0., 1., 1.])
    assert pp.identity_SE3(2, 3).lshape == (2, 3)


def test_lshape_lview_indexing():
    x = pp.randn_SE3(2, 3, key=key(13))
    assert x.lshape == (2, 3)
    assert x.shape == (2, 3, 7)
    assert x.lview(-1).lshape == (6,)
    assert x[0].lshape == (3,)
    assert x[0, 1].lshape == ()
    assert x[:, 0].lshape == (2,)
    y = x.unsqueeze(0)
    assert y.lshape == (1, 2, 3)
    assert y.squeeze(0).lshape == (2, 3)


def test_rotation_translation_scale():
    X = pp.randn_Sim3(4, key=key(14))
    assert X.rotation().ltype is pp.SO3_type
    assert X.translation().shape == (4, 3)
    assert X.scale().shape == (4, 1)
    E = pp.randn_SE3(4, key=key(15))
    np.testing.assert_allclose(np.asarray(E.translation()),
                               np.asarray(E.tensor()[..., :3]))
    R = pp.randn_SO3(4, key=key(16))
    assert R.rotation() is R
    np.testing.assert_allclose(np.asarray(R.scale()), 1.0)


def test_mat_conversions_roundtrip():
    for randn, conv in [(pp.randn_SO3, pp.mat2SO3),
                        (pp.randn_SE3, pp.mat2SE3),
                        (pp.randn_Sim3, pp.mat2Sim3)]:
        X = randn(5, key=key(17))
        M = X.matrix()
        Y = conv(M)
        pp.testing.assert_close(Y, X, atol=1e-4)
    R = pp.randn_RxSO3(5, key=key(18))
    Y = pp.mat2RxSO3(R.matrix())
    pp.testing.assert_close(Y, R, atol=1e-4)
    # from_matrix dispatch
    X = pp.randn_SE3(3, key=key(19))
    Y = pp.from_matrix(X.matrix(), ltype=pp.SE3_type)
    pp.testing.assert_close(Y, X, atol=1e-4)


def test_euler_roundtrip():
    e = jnp.array([[0.3, -0.4, 1.2], [0.0, 0.0, 0.0], [1.2, 0.5, -2.0]])
    X = pp.euler2SO3(e)
    np.testing.assert_allclose(np.asarray(X.euler()), np.asarray(e),
                               atol=1e-5)


def test_vec2skew():
    v = jnp.array([[1., 2., 3.]])
    S = pp.vec2skew(v)
    expect = np.array([[[0., -3., 2.], [3., 0., -1.], [-2., 1., 0.]]])
    np.testing.assert_allclose(np.asarray(S), expect)


def test_jit_vmap_scan_compose():
    X = pp.randn_SE3(8, key=key(20))
    p = jax.random.normal(key(21), (8, 3))

    @jax.jit
    def f(X, p):
        return (X @ X.Inv()).Act(p)

    np.testing.assert_allclose(np.asarray(f(X, p)), np.asarray(p), atol=1e-5)

    g = jax.jit(jax.vmap(lambda X, p: X.Act(p)))
    np.testing.assert_allclose(np.asarray(g(X, p)), np.asarray(X.Act(p)),
                               atol=1e-6)

    # lax.scan carrying a LieTensor
    def step(carry, x):
        return carry @ x, carry.Log().tensor()

    final, logs = jax.lax.scan(step, pp.identity_SE3(), X)
    assert final.ltype is pp.SE3_type
    assert logs.shape == (8, 6)


def test_quat2unit():
    X = pp.SO3(jnp.array([0., 0., 0., 2.]))
    Y = pp.quat2unit(X)
    np.testing.assert_allclose(np.asarray(Y.tensor()), [0., 0., 0., 1.])


def test_randn_sigma_tuples():
    x = pp.randn_se3(100, sigma=(0.1, 0.2), key=key(22))
    assert x.lshape == (100,)
    y = pp.randn_sim3(10, sigma=(1.0, 0.5, 0.1), key=key(23))
    assert y.lshape == (10,)
    z = pp.randn_rxso3(10, sigma=(1.0, 0.1), key=key(24))
    assert z.lshape == (10,)


def test_algebra_scalar_mul_and_neg():
    x = pp.randn_so3(4, key=key(25))
    y = 2.0 * x
    np.testing.assert_allclose(np.asarray(y.tensor()),
                               2 * np.asarray(x.tensor()))
    np.testing.assert_allclose(np.asarray((-x).tensor()),
                               -np.asarray(x.tensor()))
    np.testing.assert_allclose(np.asarray(x.Inv().tensor()),
                               -np.asarray(x.tensor()))
