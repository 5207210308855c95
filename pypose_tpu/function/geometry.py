r"""Stateless geometry functions: projections, KNN, Kabsch/Umeyama,
point-cloud filters.  Ref: pypose/function/geometry.py.

Filters with data-dependent output sizes (``nbr_filter``, ``voxel_filter``,
``knn_filter`` with radius) operate on concrete arrays (host path, like the
reference); jit-friendly fixed-capacity variants can be built from the
``*_mask`` helpers.
"""

from collections import namedtuple

import numpy as np

import jax
import jax.numpy as jnp

from ..basics.ops import pm
from ..lietensor.lietensor import LieTensor
from ..lietensor.convert import mat2SE3, mat2Sim3
from .checking import is_lietensor

KNNResult = namedtuple('KNNResult', ['values', 'indices'])


def cart2homo(coordinates):
    """Cartesian ``(*, N)`` -> homogeneous ``(*, N+1)`` (append ones).

    Ref: pypose/function/geometry.py:8.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pp.cart2homo(jnp.array([[1., 2., 3.]]))
        Array([[1., 2., 3., 1.]], dtype=float32)
    """
    coordinates = coordinates.tensor() if is_lietensor(coordinates) \
        else coordinates
    ones = jnp.ones_like(coordinates[..., :1])
    return jnp.concatenate([coordinates, ones], axis=-1)


def homo2cart(coordinates):
    """(*, N+1) -> (*, N) cartesian with sign-safe division.  Ref: geometry.py:37."""
    tiny = jnp.finfo(coordinates.dtype).tiny
    denum = jnp.maximum(jnp.abs(coordinates[..., -1:]), tiny)
    denum = pm(coordinates[..., -1:]) * denum
    return coordinates[..., :-1] / denum


def point2pixel(points, intrinsics, extrinsics=None):
    r"""Project 3D points ``(*, N, 3)`` to pixels ``(*, N, 2)`` through a
    pinhole camera ``intrinsics`` (``(*, 3, 3)``), optionally transforming
    by an SE3 ``extrinsics`` first.

    Ref: pypose/function/geometry.py:60.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> K = jnp.array([[100., 0., 32.], [0., 100., 32.], [0., 0., 1.]])
        >>> pp.point2pixel(jnp.array([[0.1, -0.1, 1.0]]), K)
        Array([[42., 22.]], dtype=float32)
    """
    assert points.shape[-1] == 3, 'Points shape incorrect'
    assert intrinsics.shape[-1] == intrinsics.shape[-2] == 3, \
        'Intrinsics shape incorrect.'
    if extrinsics is not None:
        assert is_lietensor(extrinsics) and extrinsics.shape[-1] == 7, \
            'Type incorrect.'
        points = extrinsics.unsqueeze(-2) @ points
    return homo2cart(points @ jnp.swapaxes(intrinsics, -1, -2))


def pixel2point(pixels, depth, intrinsics):
    """Back-project pixels with depth to 3D points.  Ref: geometry.py:115."""
    assert pixels.shape[-1] == 2, 'Pixels shape incorrect'
    assert depth.shape[-1] == pixels.shape[-2], \
        'Depth shape does not match pixels'
    assert intrinsics.shape[-1] == intrinsics.shape[-2] == 3, \
        'Intrinsics shape incorrect.'
    fx, fy = intrinsics[..., 0, 0], intrinsics[..., 1, 1]
    cx, cy = intrinsics[..., 0, 2], intrinsics[..., 1, 2]
    pts_z = depth
    pts_x = (pixels[..., 0] - cx[..., None]) * pts_z / fx[..., None]
    pts_y = (pixels[..., 1] - cy[..., None]) * pts_z / fy[..., None]
    return jnp.stack([pts_x, pts_y, pts_z], axis=-1)


def reprojerr(points, pixels, intrinsics, extrinsics=None, reduction='none'):
    """Reprojection error.  Ref: geometry.py:171."""
    assert points.shape[-1] == 3 and pixels.shape[-1] == 2 and \
        intrinsics.shape[-1] == intrinsics.shape[-2] == 3, \
        'Shape not compatible.'
    assert reduction in {'norm', 'sum', 'none'}, \
        "Reduction method can only be 'norm'|'sum'|'none'."
    img_repj = point2pixel(points, intrinsics, extrinsics)
    if reduction == 'norm':
        return jnp.linalg.norm(img_repj - pixels, axis=-1)
    elif reduction == 'sum':
        return jnp.sum(img_repj - pixels, axis=-1)
    return img_repj - pixels


def knn(ref, nbr, k=1, ord=2, dim=-1, largest=False, sorted=True,
        chunk=None):
    """Brute-force k-nearest neighbors of each ``ref`` point within ``nbr``.

    Returns ``KNNResult(values, indices)`` like ``torch.topk``.
    Ref: pypose/function/geometry.py:228.

    The small-problem path forms the ``(R, N)`` distance matrix densely
    (one fused XLA program).  Above ~64M pairs (or when ``chunk`` is
    given) a tiled path streams ``chunk`` ref rows at a time through a
    ``lax.map``, computing L2 distances in the Gram form
    ``|a|^2 + |b|^2 - 2 a.b`` — the cross term is an MXU matmul, and the
    full distance matrix never materializes, so 100k x 100k clouds fit
    on one chip (the dense form would need 40 GB).

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> ref = jnp.array([[0., 0., 0.]])
        >>> nbr = jnp.array([[5., 0., 0.], [1., 0., 0.], [3., 0., 0.]])
        >>> res = pp.knn(ref, nbr, k=2)
        >>> res.indices
        Array([[1, 2]], dtype=int32)
    """
    R, N = ref.shape[-2], nbr.shape[-2]
    auto_tiled = (chunk is None and ord == 2 and ref.ndim == 2
                  and nbr.ndim == 2 and R * N > 64 * 1024 * 1024)
    if (chunk is not None or auto_tiled) and ord == 2 and ref.ndim == 2 \
            and nbr.ndim == 2:
        if chunk is None:
            chunk = max(128, (64 * 1024 * 1024) // max(N, 1))
        return _knn_tiled(ref, nbr, k, largest, chunk)
    diff = ref[..., :, None, :] - nbr[..., None, :, :]
    dist = jnp.linalg.norm(diff, axis=dim, ord=ord)
    if largest:
        values, indices = jax.lax.top_k(dist, k)
    else:
        values, indices = jax.lax.top_k(-dist, k)
        values = -values
    return KNNResult(values, indices)


def _knn_tiled(ref, nbr, k, largest, chunk):
    """Tiled Gram-form kNN: lax.map over ref chunks; [chunk, N] distance
    tiles only.  f32 Gram cancellation (~1e-3 on far points) cannot flip
    a neighbor ranking unless true distances differ by less — acceptable
    for association (ICP); use the dense path for exactness."""
    R, N = ref.shape[0], nbr.shape[0]
    if k == 1 and k <= N and not largest \
            and jax.default_backend() == 'tpu':
        # fused Pallas kernel: the distance tiles never touch HBM
        # (the lax.map path below materializes R x N x 4 bytes per call
        # — 40 GB at 100k x 100k; ops/pallas_knn.py).  k == 1 ONLY:
        # measured on v5e at 100k x 100k (tools/nnk_hw_check.py +
        # nnk_xla_contrast.py, r5), Pallas k=1 = 84 ms vs ~317 ms for
        # the lax.map/top_k path, but the running-top-k variant LOSES
        # for k > 1 (k=4: 429 ms Pallas vs 317 ms XLA) — its k serial
        # extraction passes per VMEM tile cost more than XLA's fused
        # top_k over streamed [chunk, N] tiles.  k > 1 therefore runs
        # the lax.map path below.
        from ..ops.pallas_knn import nnk
        d2, idx = nnk(ref, nbr, k)
        return KNNResult(jnp.sqrt(d2), idx)
    pad = (-R) % chunk
    refp = jnp.pad(ref, ((0, pad), (0, 0)))
    tiles = refp.reshape(-1, chunk, ref.shape[-1])
    nbr2 = jnp.sum(nbr * nbr, axis=-1)                       # [N]

    def one(tile):
        # MXU cross term; HIGHEST pins f32 (DEFAULT is single-pass bf16
        # on TPU — with wide coordinate ranges its d2 error reaches the
        # near-neighbor gap scale).  The matmul is bandwidth-bound at
        # D=3, so the multi-pass cost is negligible.
        g = jnp.matmul(tile, nbr.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(jnp.sum(tile * tile, -1)[:, None] + nbr2[None, :]
                         - 2.0 * g, 0.0)
        if k == 1:
            idx = (jnp.argmax(d2, -1) if largest
                   else jnp.argmin(d2, -1))
            val = jnp.take_along_axis(d2, idx[:, None], -1)
            return jnp.sqrt(val), idx[:, None]
        if largest:
            v, i = jax.lax.top_k(d2, k)
            return jnp.sqrt(v), i
        v, i = jax.lax.top_k(-d2, k)
        return jnp.sqrt(-v), i

    values, indices = jax.lax.map(one, tiles)
    values = values.reshape(-1, k)[:R]
    indices = indices.reshape(-1, k)[:R]
    return KNNResult(values, indices.astype(jnp.int32))


def svdtf(source, target):
    r"""Rigid alignment (Kabsch): the SE3 ``T`` minimizing
    :math:`\sum_i \|T \cdot s_i - t_i\|^2`, with the SVD reflection fix
    applied branchlessly via ``where``.

    Ref: pypose/function/geometry.py:315.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> src = jax.random.normal(jax.random.PRNGKey(0), (10, 3))
        >>> T = pp.randn_SE3(key=jax.random.PRNGKey(1))
        >>> T_hat = pp.svdtf(src, T.Act(src))
        >>> bool(jnp.allclose(T_hat.matrix(), T.matrix(), atol=1e-5))
        True
    """
    assert source.shape[-2] == target.shape[-2], \
        'The number of points N has to be the same for both point clouds.'
    import jax
    with jax.default_matmul_precision('float32'):
        # Kabsch is precision-critical: DEFAULT f32 matmuls run as
        # single-pass bf16 on TPU, degrading noiseless alignment from
        # ~1e-7 to ~1e-2 pose error; these Grams are 3x3-tiny
        ctnsource = source.mean(axis=-2, keepdims=True)
        ctntarget = target.mean(axis=-2, keepdims=True)
        source = source - ctnsource
        target = target - ctntarget
        M = jnp.einsum('...Na,...Nb->...ab', target, source)
        U, S, Vh = jnp.linalg.svd(M)
        R = U @ Vh
        # reflection fix: flip the last column of U where det(R) == -1
        flip = jnp.abs(jnp.linalg.det(R) + 1) < 1e-6
        R = jnp.where(flip[..., None, None], -R, R)
        t = jnp.swapaxes(ctntarget, -1, -2) \
            - R @ jnp.swapaxes(ctnsource, -1, -2)
        T = jnp.concatenate([R, t], axis=-1)
        return mat2SE3(T, check=False)


def svdstf(source, target, with_scale=True):
    """Similarity alignment (Umeyama) source -> target as Sim3.

    Ref: geometry.py:361.
    """
    assert source.shape[-2] == target.shape[-2], \
        'The number of points N has to be the same for both point clouds.'
    assert source.shape[-1] == 3 and target.shape[-1] == 3
    import jax
    with jax.default_matmul_precision('float32'):  # see svdtf
        return _svdstf_inner(source, target, with_scale)


def _svdstf_inner(source, target, with_scale):
    N, m = source.shape[-2:]
    ctnsource = source.mean(axis=-2, keepdims=True)
    ctntarget = target.mean(axis=-2, keepdims=True)
    source_ = source - ctnsource
    target_ = target - ctntarget
    H = jnp.swapaxes(target_, -2, -1) @ source_ / N
    U, D, V = jnp.linalg.svd(H)
    M = jnp.broadcast_to(jnp.eye(m, dtype=U.dtype), U.shape)
    sgn = jnp.sign(jnp.linalg.det(U @ V))
    M = M.at[..., -1, -1].set(sgn)
    if with_scale:
        var_source = jnp.mean(jnp.linalg.norm(source_, axis=-1) ** 2,
                              axis=-1, keepdims=True)
        scale = jnp.sum(jnp.diagonal(M, axis1=-2, axis2=-1) * D,
                        axis=-1, keepdims=True) / var_source
    else:
        scale = jnp.ones_like(D[..., 0:1])
    scale = scale[..., None]
    R = U @ M @ V
    t = jnp.swapaxes(ctntarget, -2, -1) - scale * R @ jnp.swapaxes(
        ctnsource, -2, -1)
    T = jnp.concatenate([scale * R, t], axis=-1)
    return mat2Sim3(T, check=False)


def nbr_filter(points, nbr, radius, pdim=None, ord=2, return_mask=False):
    """Keep points with >= nbr neighbors within radius (host path).

    Ref: geometry.py:436.
    """
    points = jnp.asarray(points)
    assert points.ndim == 2, 'The point cloud dimension has to be 2.'
    pdim = points.shape[-1] if pdim is None else pdim
    assert points.shape[-1] >= pdim, \
        'The last dim of points should not less than pdim.'
    diff = points[:, None, :pdim] - points[None, :, :pdim]
    count = jnp.sum(jnp.linalg.norm(diff, axis=-1, ord=ord) <= radius,
                    axis=-1) - 1
    mask = count >= nbr
    mask_np = np.asarray(mask)
    out = points[mask_np]
    if return_mask:
        return out, mask
    return out


def random_filter(points, num, key=None):
    """Randomly sample num points.  Ref: geometry.py:496."""
    assert points.shape[-1] >= 1
    assert num <= points.shape[-2], \
        'Number of points to sample must not larger than the number of ' \
        'input points.'
    if key is None:
        from ..lietensor.lietensor import _next_key
        key = _next_key()
    indices = jax.random.permutation(key, points.shape[-2])[:num]
    return points[..., indices, :]


def voxel_filter(points, voxel, random=False, key=None):
    """Voxel downsampling: mean (or random sample) per occupied voxel.

    Host path — the output size is data-dependent, exactly like the
    reference's ``torch.unique`` formulation; do not call under ``jit``.
    Ref: pypose/function/geometry.py:530.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pts = jnp.array([[0., 0., 0.], [0.2, 0., 0.], [5., 5., 5.]])
        >>> pp.voxel_filter(pts, [1., 1., 1.])     # two occupied voxels
        Array([[0.1, 0. , 0. ],
               [5. , 5. , 5. ]], dtype=float32)
    """
    points = np.asarray(points)
    assert points.ndim == 2, 'The point cloud dimension has to be 2.'
    D, vdim = points.shape[-1], len(voxel)
    assert D >= vdim
    assert all(v != 0 for v in voxel), 'Voxel size should be nonzero.'
    minp = points[:, :vdim].min(axis=0)
    indices = ((points[:, :vdim] - minp) // np.asarray(voxel)).astype(
        np.int64)
    uniq, inverse, counts = np.unique(indices, axis=0, return_inverse=True,
                                      return_counts=True)
    if random:
        rng = np.random.default_rng(
            None if key is None else int(jax.random.randint(
                key, (), 0, 2 ** 31 - 1)))
        order = np.argsort(inverse, kind='stable')
        starts = np.cumsum(counts) - counts
        picks = starts + rng.integers(0, counts)
        return jnp.asarray(points[order][picks])
    sums = np.zeros((len(uniq), D))
    np.add.at(sums, inverse, points)
    return jnp.asarray(sums / counts[:, None])


def knn_filter(points, k, pdim=None, radius=None, ord=2):
    """Replace each point by the mean of its k+1 nearest neighbors,
    optionally dropping sparse points first.  Ref: geometry.py:605."""
    points = jnp.asarray(points)
    if radius is not None:
        assert points.ndim == 2, \
            'The points dimension has to be 2 given radius.'
    else:
        assert points.ndim >= 2
    pdim = points.shape[-1] if pdim is None else pdim
    assert points.shape[-1] >= pdim
    diff = points[..., :, None, :pdim] - points[..., None, :, :pdim]
    dist = jnp.linalg.norm(diff, axis=-1, ord=ord)
    if radius is not None:
        count = jnp.sum(dist <= radius, axis=-1) - 1
        rmask = np.asarray(count >= k)
        points, dist = points[rmask], dist[np.ix_(rmask, rmask)]
    _, idx = jax.lax.top_k(-dist, k + 1)
    return points[idx].mean(axis=-2)
