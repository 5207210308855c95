r"""Pallas TPU kernels for fused batched SE3 composition / point action.

Hot-op kernels in a structure-of-arrays layout: the natural [N, 7] storage
wastes TPU lanes (last dim 7 vs the 128-lane VPU), so the kernel views the
batch as [7, N] component planes tiled (sublane, 128-lane) over N, giving
full lane utilization with zero cross-lane shuffles — every quaternion /
cross-product term is elementwise across the batch.

Exposed as ``se3_mul_fused`` / ``se3_act_fused`` with jnp fallbacks; the
dispatch helper picks the kernel on TPU for large batches.
"""

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


_LANE = 128
_SUB = 8
_TILE = _LANE * _SUB  # batch elements per grid step


def _qmul_planes(x0, x1, x2, x3, y0, y1, y2, y3):
    """Component-plane Hamilton product (xyzw)."""
    z0 = x3 * y0 + x0 * y3 + x1 * y2 - x2 * y1
    z1 = x3 * y1 + x1 * y3 + x2 * y0 - x0 * y2
    z2 = x3 * y2 + x2 * y3 + x0 * y1 - x1 * y0
    z3 = x3 * y3 - x0 * y0 - x1 * y1 - x2 * y2
    return z0, z1, z2, z3


def _qrot_planes(q0, q1, q2, q3, p0, p1, p2):
    """Rotate point planes by quaternion planes (two cross products)."""
    u0 = 2.0 * (q1 * p2 - q2 * p1)
    u1 = 2.0 * (q2 * p0 - q0 * p2)
    u2 = 2.0 * (q0 * p1 - q1 * p0)
    o0 = p0 + q3 * u0 + (q1 * u2 - q2 * u1)
    o1 = p1 + q3 * u1 + (q2 * u0 - q0 * u2)
    o2 = p2 + q3 * u2 + (q0 * u1 - q1 * u0)
    return o0, o1, o2


def _se3_mul_kernel(x_ref, y_ref, o_ref):
    """x, y: [7, T] component planes; o: [7, T]."""
    t0, t1, t2 = x_ref[0, :], x_ref[1, :], x_ref[2, :]
    q0, q1, q2, q3 = x_ref[3, :], x_ref[4, :], x_ref[5, :], x_ref[6, :]
    s0, s1, s2 = y_ref[0, :], y_ref[1, :], y_ref[2, :]
    r0, r1, r2, r3 = y_ref[3, :], y_ref[4, :], y_ref[5, :], y_ref[6, :]
    a0, a1, a2 = _qrot_planes(q0, q1, q2, q3, s0, s1, s2)
    z0, z1, z2, z3 = _qmul_planes(q0, q1, q2, q3, r0, r1, r2, r3)
    o_ref[0, :] = t0 + a0
    o_ref[1, :] = t1 + a1
    o_ref[2, :] = t2 + a2
    o_ref[3, :] = z0
    o_ref[4, :] = z1
    o_ref[5, :] = z2
    o_ref[6, :] = z3


def _se3_act_kernel(x_ref, p_ref, o_ref):
    t0, t1, t2 = x_ref[0, :], x_ref[1, :], x_ref[2, :]
    q0, q1, q2, q3 = x_ref[3, :], x_ref[4, :], x_ref[5, :], x_ref[6, :]
    p0, p1, p2 = p_ref[0, :], p_ref[1, :], p_ref[2, :]
    a0, a1, a2 = _qrot_planes(q0, q1, q2, q3, p0, p1, p2)
    o_ref[0, :] = t0 + a0
    o_ref[1, :] = t1 + a1
    o_ref[2, :] = t2 + a2


def _pad_to(n, m):
    return -(-n // m) * m


def _planes(data, rows):
    """[N, rows] -> padded [rows, Npad] planes."""
    N = data.shape[0]
    Np = _pad_to(max(N, 1), _TILE)
    planes = jnp.swapaxes(data, 0, 1)
    if Np != N:
        planes = jnp.pad(planes, ((0, 0), (0, Np - N)))
    return planes, N, Np


@functools.partial(jax.jit, static_argnames=())
def se3_mul_fused(X, Y):
    """Fused SE3 composition on [N, 7] storage via the SoA Pallas kernel."""
    xp, N, Np = _planes(X, 7)
    yp, _, _ = _planes(Y, 7)
    grid = Np // _TILE
    out = pl.pallas_call(
        _se3_mul_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((7, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((7, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((7, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((7, Np), X.dtype),
    )(xp, yp)
    return jnp.swapaxes(out[:, :N], 0, 1)


@functools.partial(jax.jit, static_argnames=())
def se3_act_fused(X, p):
    """Fused SE3 point action on [N, 7] x [N, 3] via the SoA kernel."""
    xp, N, Np = _planes(X, 7)
    pp_, _, _ = _planes(p, 3)
    grid = Np // _TILE
    out = pl.pallas_call(
        _se3_act_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((7, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, Np), X.dtype),
    )(xp, pp_)
    return jnp.swapaxes(out[:, :N], 0, 1)


def available():
    return _HAS_PALLAS and jax.default_backend() == 'tpu'
