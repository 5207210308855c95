"""Gold-parity tests against the actual PyTorch reference implementation.

Skipped automatically when the reference checkout (/root/reference) is not
present.  Compares forward values AND gradients of every group op for all
four families, plus conversions and batched Jacobian helpers — the directly
executable version of SURVEY §4's 'reference-value tests'.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pypose_tpu as pp

REF = '/root/reference'
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip('torch')
ppref = pytest.importorskip('pypose')

GROUPS = ['SO3', 'SE3', 'RxSO3', 'Sim3']
ALGEBRA = {'SO3': 'so3', 'SE3': 'se3', 'RxSO3': 'rxso3', 'Sim3': 'sim3'}
STORAGE = {'SO3': 4, 'SE3': 7, 'RxSO3': 5, 'Sim3': 8}
TAN = {'SO3': 3, 'SE3': 6, 'RxSO3': 4, 'Sim3': 7}


def make_pair(group, n=4, seed=0, sigma=0.3):
    """Same random group elements in both frameworks."""
    rng = np.random.default_rng(seed)
    tan = rng.normal(size=(n, TAN[group])).astype(np.float32) * sigma
    Xj = pp.LieTensor(jnp.asarray(tan),
                      ltype=getattr(pp, ALGEBRA[group] + '_type')).Exp()
    xt = getattr(ppref, ALGEBRA[group])(torch.from_numpy(tan))
    Xt = xt.Exp()
    np.testing.assert_allclose(np.asarray(Xj.tensor()),
                               Xt.detach().numpy(), atol=1e-5)
    return Xj, Xt, tan


@pytest.mark.parametrize('group', GROUPS)
def test_exp_log_values(group):
    Xj, Xt, tan = make_pair(group, seed=1)
    np.testing.assert_allclose(np.asarray(Xj.Log().tensor()),
                               Xt.Log().detach().numpy(), atol=1e-5)


@pytest.mark.parametrize('group', GROUPS)
def test_inv_mul_act_values(group, n=4):
    Xj, Xt, _ = make_pair(group, seed=2)
    Yj, Yt, _ = make_pair(group, seed=3)
    np.testing.assert_allclose(np.asarray(Xj.Inv().tensor()),
                               Xt.Inv().detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray((Xj @ Yj).tensor()),
                               (Xt @ Yt).detach().numpy(), atol=1e-5)
    p = np.random.default_rng(4).normal(size=(n, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(Xj.Act(jnp.asarray(p))),
                               Xt.Act(torch.from_numpy(p)).detach().numpy(),
                               atol=1e-4)
    p4 = np.concatenate([p, np.ones((n, 1), np.float32)], -1)
    np.testing.assert_allclose(
        np.asarray(Xj.Act(jnp.asarray(p4))),
        Xt.Act(torch.from_numpy(p4)).detach().numpy(), atol=1e-4)


@pytest.mark.parametrize('group', GROUPS)
def test_adj_jinvp_values(group, n=4):
    Xj, Xt, _ = make_pair(group, seed=5)
    a = np.random.default_rng(6).normal(
        size=(n, TAN[group])).astype(np.float32) * 0.3
    np.testing.assert_allclose(
        np.asarray(Xj.Adj(jnp.asarray(a)).tensor()),
        Xt.Adj(torch.from_numpy(a)).detach().numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(Xj.AdjT(jnp.asarray(a)).tensor()),
        Xt.AdjT(torch.from_numpy(a)).detach().numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(Xj.Jinvp(jnp.asarray(a)).tensor()),
        Xt.Jinvp(torch.from_numpy(a)).detach().numpy(), atol=1e-4)


@pytest.mark.parametrize('group', GROUPS)
def test_log_gradients_match(group):
    """Reverse-mode gradients in both frameworks follow the same
    left-perturbation convention — compare them directly."""
    Xj, Xt, _ = make_pair(group, seed=7)

    g_jax = jax.grad(lambda X: jnp.sum(X.Log().tensor() ** 2))(Xj)

    Xt = ppref.Parameter(Xt.clone())
    loss = (Xt.Log() ** 2).sum()
    loss.backward()
    np.testing.assert_allclose(np.asarray(g_jax.tensor()),
                               Xt.grad.detach().numpy(), atol=2e-4)


@pytest.mark.parametrize('group', GROUPS)
def test_mul_act_gradients_match(group, n=4):
    Xj, Xt, _ = make_pair(group, seed=8)
    Yj, Yt, _ = make_pair(group, seed=9)
    p = np.random.default_rng(10).normal(size=(n, 3)).astype(np.float32)

    def f_jax(X):
        return jnp.sum((X @ Yj).Act(jnp.asarray(p)) ** 2)

    g_jax = jax.grad(f_jax)(Xj)

    Xt = ppref.Parameter(Xt.clone())
    loss = ((Xt @ Yt).Act(torch.from_numpy(p)) ** 2).sum()
    loss.backward()
    np.testing.assert_allclose(np.asarray(g_jax.tensor()),
                               Xt.grad.detach().numpy(),
                               rtol=2e-3, atol=2e-3)


def test_conversions_match():
    Xj, Xt, _ = make_pair('SO3', seed=11)
    np.testing.assert_allclose(np.asarray(Xj.matrix()),
                               Xt.matrix().detach().numpy(), atol=1e-5)
    R = Xt.matrix().detach()
    np.testing.assert_allclose(
        np.asarray(pp.mat2SO3(jnp.asarray(R.numpy())).tensor()),
        ppref.mat2SO3(R).detach().numpy(), atol=1e-4)
    e = np.asarray([[0.2, -0.3, 1.0], [0., 0., 0.]], np.float32)
    np.testing.assert_allclose(
        np.asarray(pp.euler2SO3(jnp.asarray(e)).tensor()),
        ppref.euler2SO3(torch.from_numpy(e)).detach().numpy(), atol=1e-5)
    Ej, Et, _ = make_pair('SE3', seed=12)
    np.testing.assert_allclose(np.asarray(Ej.matrix()),
                               Et.matrix().detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Ej.euler()),
                               Et.euler().detach().numpy(), atol=1e-4)


def test_cumprod_matches():
    Xj, Xt, _ = make_pair('SE3', n=7, seed=13)
    np.testing.assert_allclose(
        np.asarray(pp.cumprod(Xj, dim=0, left=True).tensor()),
        ppref.cumprod(Xt, dim=0, left=True).detach().numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(pp.cumprod(Xj, dim=0, left=False).tensor()),
        ppref.cumprod(Xt, dim=0, left=False).detach().numpy(), atol=1e-4)


def test_jacobian_helpers_match():
    """so3_Jl / se3 Jl_inv etc. against the reference's internals."""
    from pypose_tpu.lietensor import jacobian as jj
    from pypose.lietensor import operation as refop
    rng = np.random.default_rng(14)
    x3 = rng.normal(size=(5, 3)).astype(np.float32) * 0.8
    x6 = rng.normal(size=(5, 6)).astype(np.float32) * 0.8
    t3, t6 = torch.from_numpy(x3), torch.from_numpy(x6)
    pairs = [
        (jj.so3_Jl(jnp.asarray(x3)), refop.so3_Jl(t3)),
        (jj.so3_Jl_inv(jnp.asarray(x3)), refop.so3_Jl_inv(t3)),
        (jj.calcQ(jnp.asarray(x6)), refop.calcQ(t6)),
        (jj.se3_Jl(jnp.asarray(x6)), refop.se3_Jl(t6)),
        (jj.se3_Jl_inv(jnp.asarray(x6)), refop.se3_Jl_inv(t6)),
    ]
    for ours, ref in pairs:
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.detach().numpy(), atol=2e-5)
    # rxso3 Ws over a (sigma, theta) grid incl. the eps branches.  The
    # reference's small-but-not-eps sigma branch cancels catastrophically
    # in f32 ((1+(s-1)e^s)/s^2, operation.py:112-115), so compare our f32
    # against the reference evaluated in f64.
    for sigma in [0.0, 1e-5, 0.3, -1.0]:
        for theta in [0.0, 1e-5, 0.3, 2.0]:
            ax = np.array([0.6, -0.8, 0.0], np.float64) * theta
            v = np.concatenate([ax, [sigma]])[None]
            ours = jj.rxso3_Ws(jnp.asarray(v, jnp.float32))
            ref = refop.rxso3_Ws(torch.from_numpy(v))  # float64
            np.testing.assert_allclose(np.asarray(ours),
                                       ref.detach().numpy(), atol=1e-4,
                                       err_msg=f'sigma={sigma} th={theta}')


def test_gn_lm_converge_like_reference():
    """Same PoseInv problem, both optimizers: loss trajectories agree to
    the expected order of magnitude each iteration."""
    tan = np.random.default_rng(15).normal(size=(2, 2, 6)) \
        .astype(np.float32) * 0.5
    tgt = np.random.default_rng(16).normal(size=(2, 2, 6)) \
        .astype(np.float32) * 0.5

    # --- jax ---
    class PoseInvJ(pp.Module):
        def __init__(self):
            super().__init__()
            self.pose = pp.Parameter(pp.se3(jnp.asarray(tan)))

        def forward(self, input):
            return (self.pose.Exp() @ input).Log().tensor()

    inp_j = pp.se3(jnp.asarray(tgt)).Exp()
    optj = pp.optim.LM(PoseInvJ(),
                       strategy=pp.optim.strategy.Constant(damping=1e-6))
    losses_j = [optj.step(inp_j) for _ in range(4)]

    # --- torch reference ---
    class PoseInvT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.pose = ppref.Parameter(ppref.se3(torch.from_numpy(tan)))

        def forward(self, input):
            return (self.pose.Exp() @ input).Log().tensor()

    inp_t = ppref.se3(torch.from_numpy(tgt)).Exp()
    optt = ppref.optim.LM(PoseInvT(),
                          strategy=ppref.optim.strategy.Constant(
                              damping=1e-6))
    losses_t = [float(optt.step(inp_t)) for _ in range(4)]

    assert losses_j[-1] < 1e-8 and losses_t[-1] < 1e-8
    for lj, lt in zip(losses_j[:2], losses_t[:2]):
        assert abs(np.log10(max(lj, 1e-12)) - np.log10(max(lt, 1e-12))) < 1.5
