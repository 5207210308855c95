r"""Splines: cubic Hermite on R^n and cumulative SE3 B-spline.

Ref: pypose/function/spline.py.  The SE3 B-spline uses the cumulative form
(Log/Exp blending of 4 control poses); products over the 3 blended
increments are tiny static chains (no scan needed).
"""

import jax.numpy as jnp

from ..lietensor.lietensor import LieTensor
from .checking import is_SE3


def chspline(points, interval=0.1):
    r"""Cubic Hermite spline through waypoints ``(*, N, C)`` sampled at
    ``interval`` (fraction of a segment); slopes are central differences.
    The curve interpolates every waypoint.

    Ref: pypose/function/spline.py:5-104.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> wp = jnp.array([[0.], [1.], [0.]])
        >>> y = pp.chspline(wp, interval=0.5)
        >>> y.shape                               # 2 samples/segment + end
        (5, 1)
        >>> bool(jnp.allclose(y[::2, 0], wp[:, 0]))   # hits the waypoints
        True
    """
    points = jnp.asarray(points)
    assert points.ndim >= 2, 'Dimension of points should be [..., N, C]'
    assert interval < 1.0, 'The interval should be smaller than 1.'
    batch, N = points.shape[:-2], points.shape[-2]
    dt = points.dtype
    intervals = jnp.arange(0, 1, interval, dtype=dt)
    timeline = (jnp.arange(0, N, dtype=dt)[:, None] + intervals).reshape(-1)
    k = intervals.shape[0] - 1
    if k > 0:
        timeline = timeline[:-k]
    x = jnp.arange(N, dtype=dt)
    idxs = jnp.searchsorted(x[1:], timeline)
    m = points[..., 1:, :] - points[..., :-1, :]
    m = m / (x[1:] - x[:-1])[..., None]
    m = jnp.concatenate([m[..., :1, :],
                         (m[..., 1:, :] + m[..., :-1, :]) / 2,
                         m[..., -1:, :]], axis=-2)
    dx = x[idxs + 1] - x[idxs]
    t = (timeline - x[idxs]) / dx
    alpha = jnp.arange(4, dtype=dt)
    tt = t[None, :] ** alpha[:, None]
    A = jnp.array([[1, 0, -3, 2], [0, 1, -2, 1],
                   [0, 0, 3, -2], [0, 0, -1, 1]], dtype=dt)
    hh = jnp.swapaxes(A @ tt, -1, -2)
    out = hh[..., :1] * points[..., idxs, :]
    out = out + hh[..., 1:2] * m[..., idxs, :] * dx[..., None]
    out = out + hh[..., 2:3] * points[..., idxs + 1, :]
    out = out + hh[..., 3:4] * m[..., idxs + 1, :] * dx[..., None]
    return out


def bspline(data, interval=0.1, extrapolate=False):
    r"""Cumulative cubic B-spline over SE3 control poses ``(*, N)``:

    .. math:: T(t) = T_i \prod_{j=1}^{3}
              \mathrm{Exp}\big(\tilde B_j(t)\,
              \mathrm{Log}(T_{i+j-1}^{-1} T_{i+j})\big)

    with the cumulative basis :math:`\tilde B`.  The curve is smooth but
    does NOT interpolate the control poses (B-spline, not Hermite); pass
    ``extrapolate=True`` to pad the ends so the output spans all inputs.

    Ref: pypose/function/spline.py:105-225.

    Example:
        >>> import jax, pypose_tpu as pp
        >>> ctrl = pp.randn_SE3(6, sigma=0.1, key=jax.random.PRNGKey(0))
        >>> traj = pp.bspline(ctrl, interval=0.25)
        >>> traj.ltype is pp.SE3_type, traj.lshape   # (N-3)*4 + 1 poses
        (True, (13,))
    """
    assert is_SE3(data), 'The input poses are not SE3Type.'
    assert len(data.lshape) >= 1, 'Dimension of data should be [..., N, C].'
    assert interval < 1.0, 'The interval should be smaller than 1.'
    batch = data.lshape[:-1]
    if extrapolate:
        first = data[..., :1, :].expand(batch + (2, 7))
        last = data[..., -1:, :].expand(batch + (2, 7))
        data = _cat_lie([first, data, last])
    else:
        assert data.lshape[-1] >= 4, 'Number of poses is less than 4.'
    Bth, N, D = data.lshape[:-1], data.lshape[-1], data.shape[-1]
    dt = data.dtype
    timeline = jnp.arange(0, 1, interval, dtype=dt)
    tt = timeline ** jnp.arange(4, dtype=dt)[:, None]        # [4, T]
    B = jnp.array([[5, 3, -3, 1], [1, 3, 3, -2], [0, 0, 0, 1]],
                  dtype=dt) / 6                               # [3, 4]
    dP = data[..., 0:N - 3, :].unsqueeze(-2)                  # [.., N-3, 1]
    w = (B @ tt)[..., None]                                   # [3, T, 1]
    index = (jnp.arange(0, N - 3)[:, None] + jnp.arange(0, 4)).reshape(-1)
    P = data[..., index, :].lview(*(Bth + (N - 3, 4, 1)))
    P = (P[..., 0:3, :, :].Inv() * P[..., 1:4, :, :]).Log()   # se3 [.., N-3, 3, 1]
    A = (P * w).Exp()                                         # [.., N-3, 3, T]
    Aend = (P[..., -1, :] * B.sum(axis=1)[:, None]).Exp()     # [.., N-3, 3]
    Aend = Aend[..., 0:1, :] * Aend[..., 1:2, :] * Aend[..., 2:3, :]
    A = A[..., 0, :, :] * A[..., 1, :, :] * A[..., 2, :, :]   # [.., N-3, T]
    ps = dP * A                                               # [.., N-3, T]
    pend = dP[..., -1, :, :] * Aend[..., -1, :, :]
    poses = _cat_lie([ps.lview(*(Bth + (-1,))), pend])
    return poses


def _cat_lie(xs):
    data = jnp.concatenate([x.tensor() for x in xs], axis=-2)
    return LieTensor(data, ltype=xs[0].ltype)
