"""Geometry / spline / functional tests.  Ref style: tests/function/."""

import jax
import jax.numpy as jnp
import numpy as np

import pypose_tpu as pp


def test_cart_homo_roundtrip():
    p = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    h = pp.cart2homo(p)
    assert h.shape == (5, 4)
    np.testing.assert_allclose(np.asarray(pp.homo2cart(h)), np.asarray(p),
                               atol=1e-6)


def test_point2pixel_pixel2point_roundtrip():
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (10, 3),
                             minval=jnp.array([-1., -1., 2.]),
                             maxval=jnp.array([1., 1., 8.]))
    K = jnp.array([[400., 0, 320], [0, 400., 240], [0, 0, 1]])
    pix = pp.point2pixel(pts, K)
    back = pp.pixel2point(pix, pts[..., 2], K)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_reprojerr_zero_for_exact():
    key = jax.random.PRNGKey(2)
    pose = pp.randn_SE3(key=key)
    pts_cam = jax.random.uniform(jax.random.PRNGKey(3), (8, 3),
                                 minval=jnp.array([-1., -1., 3.]),
                                 maxval=jnp.array([1., 1., 9.]))
    K = jnp.array([[400., 0, 320], [0, 400., 240], [0, 0, 1]])
    world = pose.Inv().unsqueeze(-2).Act(pts_cam)
    pix = pp.point2pixel(pts_cam, K)
    err = pp.reprojerr(world, pix, K, pose, reduction='norm')
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-2)


def test_knn():
    ref = jnp.array([[0., 0., 0.], [1., 1., 1.]])
    nbr = jnp.array([[0.1, 0, 0], [2., 2., 2.], [0.9, 1., 1.]])
    values, idx = pp.knn(ref, nbr, k=2)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), [0, 2])
    assert float(values[0, 0]) < float(values[0, 1])


def test_knn_tiled_pallas_glue(monkeypatch):
    """Geometry-level KNNResult glue around the TPU-gated Pallas route
    (function/geometry.py _knn_tiled): the kernel path never runs on the
    CPU suite, so a shape/dtype mismatch in the sqrt/int32 glue would
    only surface on hardware (r4 advisor).  Here the backend gate is
    monkeypatched and the kernel runs in interpret mode.  After the r5
    measured negative (Pallas k>1 loses to the lax.map/top_k path on
    hardware) only k == 1 routes to the kernel; k > 1 must take the
    lax.map path even with the gate open — both are checked against the
    dense path in shape, dtype, sortedness, and values."""
    from pypose_tpu.function import geometry
    from pypose_tpu.ops import pallas_knn

    orig_nnk = pallas_knn.nnk
    called = {}

    def fake_nnk(ref, nbr, k):
        called['k'] = k
        return orig_nnk(ref, nbr, k, tr=64, tn=128, interpret=True)

    monkeypatch.setattr(geometry.jax, 'default_backend', lambda: 'tpu')
    monkeypatch.setattr(pallas_knn, 'nnk', fake_nnk)
    ref = jax.random.normal(jax.random.PRNGKey(10), (100, 3))
    nbr = jax.random.normal(jax.random.PRNGKey(11), (200, 3))

    # k == 1: routes to the Pallas kernel (interpret mode)
    res1 = geometry._knn_tiled(ref, nbr, 1, largest=False, chunk=64)
    assert called.get('k') == 1, 'k=1 must route to the Pallas kernel'
    dense1 = pp.knn(ref, nbr, k=1)
    assert res1.values.shape == (100, 1) and res1.indices.shape == (100, 1)
    assert res1.values.dtype == ref.dtype
    assert res1.indices.dtype == jnp.int32
    np.testing.assert_allclose(np.asarray(res1.values),
                               np.asarray(dense1.values), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(res1.indices),
                                  np.asarray(dense1.indices))

    # k > 1: must NOT call the kernel (measured hardware negative);
    # the lax.map/top_k glue still has to match the dense path
    called.clear()
    k = 8
    res = geometry._knn_tiled(ref, nbr, k, largest=False, chunk=64)
    assert 'k' not in called, 'k>1 must take the lax.map path'
    dense = pp.knn(ref, nbr, k=k)
    assert res.values.shape == (100, k) and res.indices.shape == (100, k)
    assert res.values.dtype == ref.dtype
    assert res.indices.dtype == jnp.int32
    v = np.asarray(res.values)
    assert (np.diff(v, axis=1) >= -1e-5).all(), 'values must be ascending'
    np.testing.assert_allclose(v, np.asarray(dense.values), atol=1e-3)
    # indices match wherever the neighbor gap is clear of f32 Gram noise
    dv = np.asarray(dense.values)
    gap = np.diff(dv, axis=1) > 1e-2
    clear = np.concatenate([np.ones((len(dv), 1), bool), gap], 1)
    match = (np.asarray(res.indices) == np.asarray(dense.indices))[clear]
    assert match.mean() > 0.999


def test_svdtf_recovers_pose():
    key = jax.random.PRNGKey(4)
    src = jax.random.normal(key, (30, 3))
    T = pp.randn_SE3(key=jax.random.PRNGKey(5))
    tgt = T.Act(src)
    T_est = pp.svdtf(src, tgt)
    err = (T_est.Inv() @ T).Log().tensor()
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-4)


def test_svdstf_recovers_sim3():
    key = jax.random.PRNGKey(6)
    src = jax.random.normal(key, (30, 3))
    S = pp.randn_Sim3(sigma=(0.5, 0.3, 0.2), key=jax.random.PRNGKey(7))
    tgt = S.Act(src)
    S_est = pp.svdstf(src, tgt, with_scale=True)
    np.testing.assert_allclose(np.asarray(S_est.Act(src)), np.asarray(tgt),
                               atol=1e-3)


def test_filters_shapes():
    pts = jnp.concatenate([
        jax.random.normal(jax.random.PRNGKey(8), (50, 3)) * 0.1,
        jnp.array([[100., 100., 100.]])])
    out = pp.nbr_filter(pts, nbr=3, radius=0.5)
    assert out.shape[0] < pts.shape[0]
    assert not np.any(np.asarray(out) > 50)

    sub = pp.random_filter(pts, 10, key=jax.random.PRNGKey(9))
    assert sub.shape == (10, 3)

    vox = pp.voxel_filter(pts, [1., 1., 1.])
    assert vox.shape[-1] == 3
    assert vox.shape[0] <= pts.shape[0]

    smoothed = pp.knn_filter(pts[:20], k=3)
    assert smoothed.shape == (20, 3)


def test_voxel_filter_expected_values():
    """Ref oracle style: tests/function/test_downsample.py:22-40."""
    pts = jnp.array([[0.1, 0.1], [0.2, 0.2], [1.1, 1.1]])
    out = np.asarray(pp.voxel_filter(pts, [1., 1.]))
    out = out[np.lexsort(out.T)]
    np.testing.assert_allclose(out, [[0.15, 0.15], [1.1, 1.1]], atol=1e-6)


def test_chspline_interpolates_knots():
    pts = jax.random.normal(jax.random.PRNGKey(10), (6, 3))
    out = pp.chspline(pts, interval=0.25)
    # every 4th sample is a knot
    np.testing.assert_allclose(np.asarray(out[::4]), np.asarray(pts),
                               atol=1e-5)


def test_bspline_shapes_and_smoothness():
    poses = pp.randn_SE3(7, sigma=(0.5, 0.2), key=jax.random.PRNGKey(11))
    out = pp.bspline(poses, interval=0.2)
    assert out.ltype is pp.SE3_type
    assert out.lshape[0] == (7 - 3) * 5 + 1
    ext = pp.bspline(poses, interval=0.2, extrapolate=True)
    assert ext.lshape[0] == (11 - 3) * 5 + 1
    # consecutive poses stay close (smooth curve)
    d = (out[:-1].Inv() @ out[1:]).Log().tensor()
    assert float(jnp.abs(d).max()) < 1.0


def test_bvv_bmv_bvmv():
    a = jnp.arange(3.0)
    b = jnp.arange(4.0)
    M = jnp.ones((3, 4))
    assert pp.bvv(a, b).shape == (3, 4)
    np.testing.assert_allclose(np.asarray(pp.bmv(M, b)), 6.0)
    np.testing.assert_allclose(np.asarray(pp.bvmv(a, M, b)), 18.0)


def test_checking():
    x = pp.randn_SE3(2)
    assert pp.is_lietensor(x) and pp.is_SE3(x)
    assert not pp.is_SE3(pp.randn_SO3(2))
    assert not pp.hasnan([jnp.ones(3), (jnp.zeros(2), 1.0)])
    assert pp.hasnan([jnp.ones(3), jnp.array([jnp.nan])])
