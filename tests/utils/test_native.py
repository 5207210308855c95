"""Native C++ loader vs pure-Python fallback equivalence."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import pypose_tpu as pp
from pypose_tpu import native
from pypose_tpu.datasets import load_g2o, load_bal, synthetic_sphere


@pytest.fixture
def g2o_file(tmp_path):
    ds = synthetic_sphere(60, seed=3)
    nodes = np.asarray(ds['nodes'].tensor(), np.float64)
    Z = np.asarray(ds['poses'].tensor(), np.float64)
    edges = np.asarray(ds['edges'])
    iu = np.triu_indices(6)
    info = (2.0 * np.eye(6))[iu]
    lines = ['VERTEX_SE3:QUAT %d ' % i + ' '.join('%.9f' % x for x in v)
             for i, v in enumerate(nodes)]
    for (i, j), z in zip(edges, Z):
        lines.append('EDGE_SE3:QUAT %d %d ' % (i, j)
                     + ' '.join('%.9f' % x for x in z) + ' '
                     + ' '.join('%.1f' % x for x in info))
    path = tmp_path / 'g.g2o'
    path.write_text('\n'.join(lines))
    return str(path)


def _force_python():
    native._lib = None
    native._tried = True


def _restore():
    native._tried = False


def test_g2o_native_matches_python(g2o_file):
    if native.get_lib() is None:
        pytest.skip('no C++ toolchain')
    d1 = load_g2o(g2o_file)
    _force_python()
    try:
        d2 = load_g2o(g2o_file)
    finally:
        _restore()
    np.testing.assert_allclose(np.asarray(d1['nodes'].tensor()),
                               np.asarray(d2['nodes'].tensor()), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d1['edges']),
                                  np.asarray(d2['edges']))
    np.testing.assert_allclose(np.asarray(d1['poses'].tensor()),
                               np.asarray(d2['poses'].tensor()), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d1['infos']),
                               np.asarray(d2['infos']), atol=1e-6)
    # info matrices symmetric with the diagonal NOT doubled
    np.testing.assert_allclose(np.asarray(d1['infos'][0]), 2.0 * np.eye(6),
                               atol=1e-6)


def test_bal_native_matches_python(tmp_path):
    if native.get_lib() is None:
        pytest.skip('no C++ toolchain')
    rng = np.random.default_rng(0)
    C, P, O = 3, 5, 7
    lines = [f'{C} {P} {O}']
    for _ in range(O):
        u, v = rng.normal(size=2)
        lines.append(f'{rng.integers(0, C)} {rng.integers(0, P)} {u} {v}')
    lines += [str(x) for x in rng.normal(size=9 * C)]
    lines += [str(x) for x in rng.normal(size=3 * P)]
    path = tmp_path / 'p.bal'
    path.write_text('\n'.join(lines))
    b1 = load_bal(str(path))
    _force_python()
    try:
        b2 = load_bal(str(path))
    finally:
        _restore()
    for k in ('pixels', 'cameras', 'points'):
        np.testing.assert_allclose(np.asarray(b1[k]), np.asarray(b2[k]),
                                   atol=1e-6)
    np.testing.assert_allclose(np.asarray(b1['poses'].tensor()),
                               np.asarray(b2['poses'].tensor()), atol=1e-6)


@pytest.mark.slow
def test_g2o_roundtrip_and_weighted_pgo(tmp_path):
    """save_g2o -> load_g2o (native parser) round-trips bit-exactly, and
    the 6x6 information matrices drive a weighted optimization
    (reference workload: examples/module/pgo/pgo.py:45-85 with infos).
    Slow tier: the weighted LM optimize compile is ~20 s cold."""
    from pypose_tpu.datasets import save_g2o
    from pypose_tpu.optim.sparse import pgo

    ds = synthetic_sphere(50, seed=8, info='natural')
    path = str(tmp_path / 'sphere50.g2o')
    save_g2o(path, ds['nodes'], ds['edges'], ds['poses'], ds['infos'])
    d2 = load_g2o(path)
    np.testing.assert_allclose(np.asarray(d2['nodes'].tensor()),
                               np.asarray(ds['nodes'].tensor()), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d2['edges']),
                                  np.asarray(ds['edges']))
    np.testing.assert_allclose(np.asarray(d2['infos']),
                               np.asarray(ds['infos']), rtol=1e-6)
    assert float(jnp.abs(d2['infos'][0, 0, 0] - 400.0)) < 1e-3  # non-identity

    nodes, hist = pgo(d2['nodes'], d2['edges'], d2['poses'],
                      infos=d2['infos'], steps=8, cg_iter=80)
    assert hist[-1] < hist[0] * 1e-2  # information-weighted convergence


def test_bal_roundtrip(tmp_path):
    from pypose_tpu.datasets import save_bal, synthetic_bal

    ds = synthetic_bal(n_cams=4, n_points=20, obs_per_point=3, seed=1)
    path = str(tmp_path / 'toy.bal')
    save_bal(path, ds['poses'], ds['points'], ds['cam_idx'], ds['pt_idx'],
             ds['pixels'], ds['cameras'])
    b = load_bal(path)
    np.testing.assert_allclose(np.asarray(b['points']),
                               np.asarray(ds['points']), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b['pixels']),
                               np.asarray(ds['pixels']), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(b['cam_idx']),
                                  np.asarray(ds['cam_idx']))
    # poses survive the SO3 Log -> Rodrigues -> Exp round trip
    d = (b['poses'].Inv() @ ds['poses']).Log().tensor()
    assert float(jnp.max(jnp.abs(d))) < 1e-5


def _datafile(name):
    from pypose_tpu.datasets import find_data
    p = find_data(name)
    if p is None:
        pytest.skip(f'{name} not vendored')
    return p


def test_realformat_g2o_excerpt():
    """Parse the vendored real-format g2o excerpt: comments (one containing
    a record keyword), FIX records, unknown record types, non-contiguous
    shuffled vertex ids, flipped-direction edges, scientific-notation corner
    cases (tools/make_realformat_excerpt.py).  Both parsers must agree, and
    the graph must be geometrically consistent (optimization reaches ~0)."""
    path = _datafile('realformat_excerpt.g2o')
    d1 = load_g2o(path)
    assert d1['nodes'].lshape[0] == 12
    assert d1['edges'].shape == (14, 2)
    assert int(jnp.max(d1['edges'])) == 11       # ids remapped to rows
    # infos are full SPD matrices, not identity
    assert float(jnp.abs(d1['infos'][0, 0, 1])) > 0
    if native.get_lib() is not None:
        _force_python()
        try:
            d2 = load_g2o(path)
        finally:
            _restore()
        np.testing.assert_allclose(np.asarray(d1['nodes'].tensor()),
                                   np.asarray(d2['nodes'].tensor()),
                                   atol=1e-12)
        np.testing.assert_array_equal(np.asarray(d1['edges']),
                                      np.asarray(d2['edges']))
        np.testing.assert_allclose(np.asarray(d1['poses'].tensor()),
                                   np.asarray(d2['poses'].tensor()),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(d1['infos']),
                                   np.asarray(d2['infos']), rtol=1e-12)
    # consistency: the excerpt's flipped edges carry inverted measurements,
    # so weighted PGO must drive the residual to ~the measurement noise
    from pypose_tpu.optim.sparse import pgo
    nodes, hist = pgo(d1['nodes'], d1['edges'], d1['poses'],
                      infos=d1['infos'], steps=8, cg_iter=100)
    assert hist[-1] < hist[0] * 1e-2


def test_realformat_bal_excerpt():
    """Parse the vendored real-format BAL excerpt (exponent notation,
    negative distortion coefficients)."""
    path = _datafile('realformat_excerpt_bal.txt')
    b1 = load_bal(path)
    assert b1['poses'].lshape[0] == 3
    assert b1['points'].shape == (20, 3)
    assert b1['pixels'].shape[0] == 40
    # f, k1, k2 parsed with signs/exponents intact
    np.testing.assert_allclose(np.asarray(b1['cameras'][0]),
                               [4.98e2, -3.1e-07, 5.2e-13], rtol=1e-6)
    if native.get_lib() is not None:
        _force_python()
        try:
            b2 = load_bal(path)
        finally:
            _restore()
        for k in ('pixels', 'cameras', 'points'):
            np.testing.assert_allclose(np.asarray(b1[k]), np.asarray(b2[k]),
                                       rtol=1e-12)
