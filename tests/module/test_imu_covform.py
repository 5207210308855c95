"""Parity of the two covariance-propagation forms in IMUPreintegrator.

``propagate_cov`` has two mathematically identical implementations of the
P <- A P A^T + B flipped-cumprod span: the 81-column form (TPU runtime
win: no (16, 128)-padded [.., 9, 9] temps) and the compact matmul form
(45x faster XLA:CPU compile — the column form took ~39 s to compile at
F=20, which dominated the fast gate).  The backend picks automatically;
this pins them against each other (slow tier: compiling the column form
on CPU is the expensive part).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import pypose_tpu as pp
from pypose_tpu.module import IMUPreintegrator

pytestmark = pytest.mark.slow


def _run(covform, F=20, seed=0):
    os.environ['PPT_IMU_COVFORM'] = covform
    try:
        integ = IMUPreintegrator(reset=True, prop_cov=True)
        rng = np.random.default_rng(seed)
        dt = jnp.full((1, F, 1), 0.01)
        gyro = jnp.asarray(rng.normal(0, 0.3, (1, F, 3)), jnp.float32)
        acc = jnp.asarray(rng.normal(0, 1.0, (1, F, 3)) +
                          np.array([0., 0., 9.81007]), jnp.float32)
        out = integ(dt, gyro, acc)
        return {k: np.asarray(v.tensor() if hasattr(v, 'tensor') else v)
                for k, v in out.items()}
    finally:
        os.environ.pop('PPT_IMU_COVFORM', None)


def test_column_and_matmul_cov_forms_agree():
    a = _run('col')
    b = _run('mat')
    for k in ('rot', 'pos', 'vel'):
        np.testing.assert_allclose(a[k], b[k], atol=1e-6)
    np.testing.assert_allclose(a['cov'], b['cov'], rtol=1e-4, atol=1e-10)


def test_closed_form_agrees_with_matmul():
    """The O(F) closed form (default) vs the legacy matmul scan."""
    for seed in (0, 3):
        a = _run('mat', F=50, seed=seed)
        b = _run('closed', F=50, seed=seed)
        for k in ('rot', 'pos', 'vel'):
            np.testing.assert_allclose(a[k], b[k], atol=1e-6)
        # atol floor: the ~1e-13 cross terms (vs 5e-6 diagonal) carry
        # f32 reassociation noise between the two accumulation orders
        np.testing.assert_allclose(a['cov'], b['cov'], rtol=1e-4,
                                   atol=1e-9)


def test_column_form_chunked_agrees():
    """Chunked lax.scan path (F > COV_SCAN_CHUNK) vs monolithic span."""
    os.environ['PPT_IMU_COVFORM'] = 'mat'
    try:
        F = 64
        rng = np.random.default_rng(1)
        dt = jnp.full((1, F, 1), 0.01)
        gyro = jnp.asarray(rng.normal(0, 0.3, (1, F, 3)), jnp.float32)
        acc = jnp.asarray(rng.normal(0, 1.0, (1, F, 3)) +
                          np.array([0., 0., 9.81007]), jnp.float32)
        mono = IMUPreintegrator(reset=True, prop_cov=True)
        out_mono = mono(dt, gyro, acc)
        chunked = IMUPreintegrator(reset=True, prop_cov=True)
        chunked.COV_SCAN_CHUNK = 16
        out_chunk = chunked(dt, gyro, acc)
        # chunking reassociates the f32 span products: tiny cross terms
        # (~1e-13 of the 1e-3 diagonal) differ by accumulation order
        np.testing.assert_allclose(np.asarray(out_mono['cov']),
                                   np.asarray(out_chunk['cov']),
                                   rtol=1e-3, atol=5e-7)
    finally:
        os.environ.pop('PPT_IMU_COVFORM', None)
