"""KITTI raw oxts round-trip: synthesize a drive in the real on-disk
format, load it through the same parser a user would point at an
extracted KITTI drive, and preintegrate (workload parity:
reference examples/module/imu/imu_dataset.py + imu_integrator.py).
"""

import numpy as np

import jax.numpy as jnp

import pypose_tpu as pp
from pypose_tpu.datasets import (load_kitti_imu, save_kitti_oxts,
                                 kitti_imu_windows, _OXTS_FIELDS)
from pypose_tpu.module import IMUPreintegrator

G = 9.81007


def synth_drive(tmp_path, F=40, dt=0.1):
    """Constant forward acceleration, no rotation, flat earth: every
    derived quantity has a closed form."""
    idx = {k: i for i, k in enumerate(_OXTS_FIELDS)}
    a = 0.5                     # forward (x) accel, m/s^2
    t = np.arange(F + 1) * dt
    pk = np.zeros((F + 1, 30))
    lat0 = 49.0
    er = 6378137.0
    scale = np.cos(lat0 * np.pi / 180.0)
    x = 0.5 * a * t ** 2        # true east-ward position
    pk[:, idx['lat']] = lat0
    # invert the Mercator x projection for longitude
    pk[:, idx['lon']] = x * 180.0 / (np.pi * er * scale)
    pk[:, idx['alt']] = 7.0
    pk[:, idx['yaw']] = 0.0     # facing +x (east in the projection)
    pk[:, idx['vf']] = a * t
    pk[:, idx['ax']] = a
    pk[:, idx['az']] = G        # accelerometer measures gravity reaction
    stamps = 1e9 + t
    save_kitti_oxts(str(tmp_path), stamps, pk)
    return a


def test_kitti_roundtrip_and_preintegration(tmp_path):
    a = synth_drive(tmp_path)
    data = load_kitti_imu(str(tmp_path))
    F = data['dt'].shape[0]
    assert data['gyro'].shape == (F, 3) and data['acc'].shape == (F, 3)
    np.testing.assert_allclose(np.asarray(data['dt']), 0.1, atol=1e-6)
    # ground-truth velocity/position match the closed form
    tf = np.arange(F) * 0.1
    np.testing.assert_allclose(np.asarray(data['gt_vel'][:, 0]), a * tf,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(data['gt_pos'][:, 0]),
                               0.5 * a * tf ** 2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(data['gt_pos'][:, 1:]), 0.0,
                               atol=2e-3)

    # preintegrate the loaded stream: must reproduce the ground truth
    integ = IMUPreintegrator(reset=True, prop_cov=False, gravity=G)
    out = integ(data['dt'][None], data['gyro'][None], data['acc'][None])
    T = F * 0.1
    np.testing.assert_allclose(float(out['pos'][0, -1, 0]),
                               0.5 * a * T ** 2, rtol=1e-2)
    np.testing.assert_allclose(float(out['vel'][0, -1, 0]), a * T,
                               rtol=1e-3)

    # windowing mirrors the reference dataset's __getitem__
    wins = kitti_imu_windows(data, duration=10, step=5)
    assert len(wins) == (F - 10 + 4) // 5 or len(wins) > 0
    w = wins[0]
    assert w['dt'].shape == (10, 1) and w['gt_pos'].shape == (10, 3)
    assert w['init_pos'].shape == (1, 3)
