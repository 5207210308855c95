"""APE/RPE tests vs numpy-computed expectations.  Ref style:
tests/function/test_metric.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pypose_tpu as pp
from pypose_tpu.metric import ape, rpe, StampedSE3


def _traj(n=10, seed=0):
    gt = pp.randn_SE3(n, sigma=(1.0, 0.3), key=jax.random.PRNGKey(seed))
    # sort-friendly timestamps
    stamps = jnp.arange(n, dtype=jnp.float64)
    return stamps, gt


def test_ape_identical_trajectories():
    stamps, gt = _traj()
    out = ape(stamps, gt, stamps, gt, etype='translation', otype='All')
    assert float(out['RMSE']) < 1e-6
    assert float(out['Max']) < 1e-6


def test_ape_constant_offset():
    stamps, gt = _traj(seed=1)
    offset = jnp.array([1., 0., 0.])
    est = pp.SE3(gt.tensor().at[..., :3].add(offset))
    out = ape(stamps, gt, stamps, est, etype='translation', otype='RMSE')
    np.testing.assert_allclose(float(out), 1.0, rtol=1e-5)
    # with SE3/Sim3 alignment the offset vanishes
    out_aligned = ape(stamps, gt, stamps, est, etype='translation',
                      align=True, otype='RMSE')
    assert float(out_aligned) < 2e-2


def test_ape_rotation_stats_vs_numpy():
    stamps, gt = _traj(seed=2)
    est = pp.randn_SE3(10, sigma=(0.5, 0.2), key=jax.random.PRNGKey(3)) @ gt
    out = ape(stamps, gt, stamps, est, etype='radian', otype='All')
    # numpy oracle for radian error
    R_est = np.asarray(est.rotation().matrix())
    R_gt = np.asarray(gt.rotation().matrix())
    errs = []
    for a, b in zip(R_est, R_gt):
        E = a.T @ b
        c = np.clip((np.trace(E) - 1) / 2, -1, 1)
        errs.append(np.arccos(c))
    errs = np.asarray(errs)
    np.testing.assert_allclose(float(out['Mean']), errs.mean(), rtol=1e-3)
    np.testing.assert_allclose(float(out['RMSE']),
                               np.sqrt((errs ** 2).mean()), rtol=1e-3)


def test_rpe_frame_pairs():
    stamps, gt = _traj(n=12, seed=4)
    est = gt  # identical -> zero rpe
    out = rpe(stamps, gt, stamps, est, etype='translation', delta=1,
              otype='RMSE')
    assert float(out) < 1e-6


def test_rpe_scale_drift():
    """Estimated trajectory with scaled translations has nonzero RPE."""
    stamps, gt = _traj(n=12, seed=5)
    est = pp.SE3(gt.tensor().at[..., :3].multiply(1.5))
    out = rpe(stamps, gt, stamps, est, etype='translation', delta=1,
              otype='Mean')
    assert float(out) > 0.05


def test_associate_subset():
    stamps, gt = _traj(n=10, seed=6)
    # estimation has every other frame
    est_stamps = stamps[::2]
    est = gt[::2]
    out = ape(stamps, gt, est_stamps, est, etype='translation',
              otype='RMSE', thresh=0.1)
    assert float(out) < 1e-6


def test_stamped_se3_accumulated_distances():
    poses = pp.identity_SE3(4)
    poses = pp.SE3(poses.tensor().at[:, 0].set(jnp.array([0., 1., 2., 3.])))
    traj = StampedSE3(None, poses)
    np.testing.assert_allclose(traj.accumulated_distances, [0, 1, 2, 3],
                               atol=1e-6)
