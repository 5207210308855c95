"""Module-level gold parity against the PyTorch reference: EKF, UKF,
IMUPreintegrator, LQR outputs on identical inputs.  Skipped when
/root/reference is absent.
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


def test_ekf_parity():
    class SysJ(pp.module.NLS):
        def state_transition(self, state, input, t=None):
            return jnp.cos(state) + input

        def observation(self, state, input, t=None):
            return jnp.sin(state) + input

    class SysT(ppref.module.NLS):
        def state_transition(self, state, input, t=None):
            return state.cos() + input

        def observation(self, state, input, t=None):
            return state.sin() + input

    rng = np.random.default_rng(0)
    x = rng.normal(size=2).astype(np.float32)
    y = rng.normal(size=2).astype(np.float32)
    u = rng.normal(size=2).astype(np.float32)
    P = np.eye(2, dtype=np.float32) * 4.0
    Q = np.eye(2, dtype=np.float32) * 0.01
    R = np.eye(2, dtype=np.float32) * 0.01

    ekf_j = pp.module.EKF(SysJ())
    xj, Pj = ekf_j(jnp.asarray(x), jnp.asarray(y), jnp.asarray(u),
                   jnp.asarray(P), jnp.asarray(Q), jnp.asarray(R))

    mt = SysT()
    mt(torch.from_numpy(x), torch.from_numpy(u))  # set state/input attrs
    ekf_t = ppref.module.EKF(mt)
    xt, Pt = ekf_t(torch.from_numpy(x), torch.from_numpy(y),
                   torch.from_numpy(u), torch.from_numpy(P),
                   torch.from_numpy(Q), torch.from_numpy(R))
    np.testing.assert_allclose(np.asarray(xj), xt.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(Pj), Pt.detach().numpy(),
                               atol=1e-4)


def test_imu_preintegrator_parity():
    rng = np.random.default_rng(1)
    F = 12
    dt = np.full((1, F, 1), 0.01, np.float32)
    gyro = rng.normal(size=(1, F, 3)).astype(np.float32) * 0.5
    acc = rng.normal(size=(1, F, 3)).astype(np.float32) + \
        np.array([0, 0, 9.81007], np.float32)

    ij = pp.module.IMUPreintegrator(reset=True, prop_cov=True)
    outj = ij(jnp.asarray(dt), jnp.asarray(gyro), jnp.asarray(acc))

    it = ppref.module.IMUPreintegrator(reset=True, prop_cov=True)
    outt = it(torch.from_numpy(dt), torch.from_numpy(gyro),
              torch.from_numpy(acc))

    np.testing.assert_allclose(np.asarray(outj['pos']),
                               outt['pos'].detach().numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(outj['vel']),
                               outt['vel'].detach().numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(outj['rot'].tensor()),
                               outt['rot'].detach().numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(outj['cov']),
                               outt['cov'].detach().numpy(),
                               rtol=1e-2, atol=1e-9)


def test_lqr_parity():
    rng = np.random.default_rng(2)
    ns, nc, T = 3, 2, 5
    A = (np.eye(ns) + 0.1 * rng.normal(size=(ns, ns))).astype(np.float32)
    B = rng.normal(size=(ns, nc)).astype(np.float32)
    C = np.eye(ns, dtype=np.float32)
    D = np.zeros((ns, nc), np.float32)
    Qm = rng.normal(size=(ns + nc, ns + nc)).astype(np.float32)
    Qm = Qm @ Qm.T + (ns + nc) * np.eye(ns + nc, dtype=np.float32)
    p = rng.normal(size=(ns + nc,)).astype(np.float32)
    x0 = rng.normal(size=(1, ns)).astype(np.float32)

    sys_j = pp.module.LTI(*map(jnp.asarray, (A, B, C, D)))
    lqr_j = pp.module.LQR(sys_j, jnp.asarray(Qm)[None],
                          jnp.asarray(p)[None], T)
    xj, uj, cj = lqr_j(jnp.asarray(x0))

    sys_t = ppref.module.LTI(*map(torch.from_numpy, (A, B, C, D)))
    lqr_t = ppref.module.LQR(sys_t, torch.from_numpy(Qm)[None],
                             torch.from_numpy(p)[None], T)
    xt, ut, ct = lqr_t(torch.from_numpy(x0))

    np.testing.assert_allclose(np.asarray(xj), xt.detach().numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(uj), ut.detach().numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(cj[0]), float(ct[0]), rtol=1e-3)


def test_epnp_parity():
    rng = np.random.default_rng(3)
    n = 10
    pts_cam = rng.uniform([-2, -2, 4], [2, 2, 12],
                          size=(n, 3)).astype(np.float32)
    K = np.array([[500., 0, 320], [0, 500., 240], [0, 0, 1]], np.float32)
    # ground-truth pose
    Xj_t = pp.randn_SE3(sigma=(0.5, 0.2), key=jax.random.PRNGKey(3))
    world = np.asarray(Xj_t.Inv().unsqueeze(-2).Act(jnp.asarray(pts_cam)))
    pix = np.asarray(pp.point2pixel(jnp.asarray(pts_cam), jnp.asarray(K)))

    pose_j = pp.module.EPnP(refine=False)(
        jnp.asarray(world), jnp.asarray(pix), jnp.asarray(K))
    pose_t = ppref.module.EPnP(refine=False)(
        torch.from_numpy(world), torch.from_numpy(pix),
        torch.from_numpy(K))
    # both must recover the same pose (compare via geodesic distance)
    err = (pose_j.Inv() @ pp.SE3(jnp.asarray(
        pose_t.detach().numpy()))).Log().tensor()
    assert float(jnp.abs(err).max()) < 1e-2


def test_svdtf_spline_parity():
    rng = np.random.default_rng(4)
    src = rng.normal(size=(20, 3)).astype(np.float32)
    tgt = rng.normal(size=(20, 3)).astype(np.float32)
    Tj = pp.svdtf(jnp.asarray(src), jnp.asarray(tgt))
    Tt = ppref.svdtf(torch.from_numpy(src), torch.from_numpy(tgt))
    np.testing.assert_allclose(np.asarray(Tj.tensor()),
                               Tt.detach().numpy(), atol=1e-4)

    pts = rng.normal(size=(6, 3)).astype(np.float32)
    cj = pp.chspline(jnp.asarray(pts), interval=0.25)
    ct = ppref.chspline(torch.from_numpy(pts), interval=0.25)
    np.testing.assert_allclose(np.asarray(cj), ct.detach().numpy(),
                               atol=1e-5)

    tanv = rng.normal(size=(6, 6)).astype(np.float32) * 0.3
    Pj = pp.se3(jnp.asarray(tanv)).Exp()
    Pt = ppref.se3(torch.from_numpy(tanv)).Exp()
    bj = pp.bspline(Pj, interval=0.25)
    bt = ppref.bspline(Pt, interval=0.25)
    np.testing.assert_allclose(np.asarray(bj.tensor()),
                               bt.detach().numpy(), atol=1e-4)


def test_ape_rpe_parity():
    # odd n: torch.median picks the lower-middle element for even lengths
    # while jnp.median averages — the sole stats convention difference
    rng = np.random.default_rng(5)
    n = 11
    tan = rng.normal(size=(n, 6)).astype(np.float32) * 0.4
    tan2 = rng.normal(size=(n, 6)).astype(np.float32) * 0.1
    gt_j = pp.se3(jnp.asarray(tan)).Exp()
    est_j = pp.se3(jnp.asarray(tan2)).Exp() @ gt_j
    gt_t = ppref.se3(torch.from_numpy(tan)).Exp()
    est_t = ppref.se3(torch.from_numpy(tan2)).Exp() @ gt_t
    stamps_j = jnp.arange(n, dtype=jnp.float64)
    stamps_t = torch.arange(n, dtype=torch.float64)

    rj = pp.metric.ape(stamps_j, gt_j, stamps_j, est_j,
                       etype='translation', otype='All')
    rt = ppref.metric.ape(stamps_t, gt_t, stamps_t, est_t,
                          etype='translation', otype='All')
    for k in ('Max', 'Mean', 'RMSE', 'SSE', 'Median', 'STD'):
        np.testing.assert_allclose(float(rj[k]), float(rt[k]), rtol=1e-3,
                                   err_msg=f'APE {k}')

    rj = pp.metric.rpe(stamps_j, gt_j, stamps_j, est_j,
                       etype='rotation', delta=1, otype='RMSE')
    rt = ppref.metric.rpe(stamps_t, gt_t, stamps_t, est_t,
                          etype='rotation', delta=1, otype='RMSE')
    np.testing.assert_allclose(float(rj), float(rt), rtol=1e-3)
