r"""Scalarized (structure-of-[E]-vectors) SE3 PGO residual + Jacobian.

Why this exists: the AoS closed-form chain (``SE3_Inv``/``SE3_Mul``/
``SE3_Log`` + ``se3_Jl_inv`` @ ``SE3_Adj``) materializes dozens of
``[E, 3, 3]`` intermediates.  XLA tiles a buffer's two minor dims to
(8, 128), so each such temp moves ~114x its logical bytes through HBM
— measured 43.8 ms / 1.25 GB of temps for the per-edge Jacobian stage
at E=1.8e5 (tools/formation_prof.py, r3), ~25x off roofline.

Here every intermediate is a PLAIN ``[E]`` vector (matrices are 3x3
nested tuples of them): no two-small-minor-dim buffer exists until the
single final ``[E, 6, 2, 6]`` stack, so XLA fuses the whole chain into
a handful of elementwise kernels at lane width E.

Math (identical to ``optim.sparse.pgo_factor``'s closed form):
    M  = Z^{-1} X_i^{-1}
    r  = Log(M X_j)                                  in [tau, phi] order
    Jj = se3_Jl_inv(r) @ SE3_Adj(M)
       = [[A R, A S + B R], [0, A R]]
with A = so3_Jl_inv(phi), B = -A Q A (Q = calcQ(r)), R = R(M),
S = skew(t_M) R, and dr/d(delta_i) = -Jj (left perturbation).

Coefficient functions (Taylor-guarded) are shared with
``lietensor.jacobian`` — they are elementwise already.
Ref parity: pypose/lietensor/operation.py:37-75 (calcQ/Jl_inv),
pypose/optim/functional.py (modjac path the reference's PGO uses).
"""

import jax.numpy as jnp

from .jacobian import coef_Jl_inv, coefQ2, coefQ3, sinc3

__all__ = ['se3_pgo_blocks', 'bal_reproj_blocks']


# ---------------------------------------------------------------------------
# quaternion / vector component algebra ([E]-vector tuples)
# ---------------------------------------------------------------------------

def _qconj(q):
    x, y, z, w = q
    return (-x, -y, -z, w)


def _qmul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz)


def _qrot(q, v):
    """Rotate vector v by unit quaternion q: v + w*t + qv x t,
    t = 2 qv x v."""
    x, y, z, w = q
    vx, vy, vz = v
    tx = 2.0 * (y * vz - z * vy)
    ty = 2.0 * (z * vx - x * vz)
    tz = 2.0 * (x * vy - y * vx)
    return (vx + w * tx + (y * tz - z * ty),
            vy + w * ty + (z * tx - x * tz),
            vz + w * tz + (x * ty - y * tx))


def _quat2R(q):
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return ((1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)),
            (2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)),
            (2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)))


def _skew(v):
    x, y, z = v
    o = 0.0
    return ((o, -z, y), (z, o, -x), (-y, x, o))


def _mm3(A, B):
    return tuple(tuple(sum(A[i][k] * B[k][j] for k in range(3))
                       for j in range(3)) for i in range(3))


def _mv3(A, v):
    return tuple(sum(A[i][k] * v[k] for k in range(3)) for i in range(3))


def _madd(*Ms):
    return tuple(tuple(sum(M[i][j] for M in Ms) for j in range(3))
                 for i in range(3))


def _mscale(s, M):
    return tuple(tuple(s * M[i][j] for j in range(3)) for i in range(3))


def _eye3():
    return ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))


# ---------------------------------------------------------------------------
# group maps in component form
# ---------------------------------------------------------------------------

def _so3_log(q):
    """Component SO3_Log, same branches as operation.SO3_Log
    (operation.py:255-283)."""
    x, y, z, w = q
    v2 = x * x + y * y + z * z
    vn = jnp.sqrt(jnp.maximum(v2, 1e-36))
    eps = jnp.finfo(jnp.result_type(w)).eps
    v_big = vn > eps
    w_big = jnp.abs(w) > eps
    w_safe = jnp.where(w_big, w, 1.0)
    vn_safe = jnp.where(v_big, vn, 1.0)
    factor_main = 2.0 * jnp.arctan2(vn, w) / vn_safe
    factor_main = jnp.where(w < 0, factor_main - 2.0 * jnp.pi / vn_safe,
                            factor_main)
    factor_small_v = 2.0 / w_safe - 2.0 * v2 / (3.0 * w_safe ** 3)
    f = jnp.where(v_big, factor_main, factor_small_v)
    return (f * x, f * y, f * z)


def _so3_Jl_inv(phi):
    """A = I - K/2 + coef_Jl_inv(theta) K^2 in component form."""
    theta = jnp.sqrt(jnp.maximum(
        phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2], 1e-36))
    K = _skew(phi)
    C = coef_Jl_inv(theta)
    return _madd(_eye3(), _mscale(-0.5, K), _mscale(C, _mm3(K, K)))


def _calcQ(tau, phi):
    """Q block of the se3 left Jacobian (jacobian.calcQ, component form)."""
    theta = jnp.sqrt(jnp.maximum(
        phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2], 1e-36))
    Tau, Phi = _skew(tau), _skew(phi)
    c1, c2, c3 = sinc3(theta), coefQ2(theta), coefQ3(theta)
    PT, TP = _mm3(Phi, Tau), _mm3(Tau, Phi)
    PTP = _mm3(PT, Phi)
    return _madd(
        _mscale(0.5, Tau),
        _mscale(c1, _madd(PT, TP, PTP)),
        _mscale(c2, _madd(_mm3(Phi, PT), _mm3(TP, Phi),
                          _mscale(-3.0, PTP))),
        _mscale(c3, _madd(_mm3(PTP, Phi), _mm3(Phi, PTP))))


# ---------------------------------------------------------------------------
# the fused PGO block routine
# ---------------------------------------------------------------------------

def se3_pgo_blocks(Xi, Xj, Z):
    """Residual + closed-form tangent Jacobian for a batch of SE3
    relative-pose factors, all intermediates [E]-shaped.

    Args:
        Xi, Xj: [E, 7] SE3 storage (t, q) of the edge endpoints.
        Z: [E, 7] SE3 measurements.

    Returns:
        (r, J): r [E, 6] residual ``Log(Z^-1 Xi^-1 Xj)`` in [tau, phi]
        order; J [E, 6, 2, 6] with ``J[:, :, 0] = -Jj`` (w.r.t. the
        left perturbation of Xi) and ``J[:, :, 1] = Jj``.
    """
    ti = (Xi[..., 0], Xi[..., 1], Xi[..., 2])
    qi = (Xi[..., 3], Xi[..., 4], Xi[..., 5], Xi[..., 6])
    tj = (Xj[..., 0], Xj[..., 1], Xj[..., 2])
    qj = (Xj[..., 3], Xj[..., 4], Xj[..., 5], Xj[..., 6])
    tz = (Z[..., 0], Z[..., 1], Z[..., 2])
    qz = (Z[..., 3], Z[..., 4], Z[..., 5], Z[..., 6])

    # M = Z^-1 Xi^-1
    qzi = _qconj(qz)
    tzi = tuple(-c for c in _qrot(qzi, tz))
    qii = _qconj(qi)
    tii = tuple(-c for c in _qrot(qii, ti))
    rot = _qrot(qzi, tii)
    tm = tuple(a + b for a, b in zip(tzi, rot))
    qm = _qmul(qzi, qii)

    # P = M Xj;  r = Log(P)
    tp = tuple(a + b for a, b in zip(tm, _qrot(qm, tj)))
    qp = _qmul(qm, qj)
    phi = _so3_log(qp)
    A_p = _so3_Jl_inv(phi)          # Jl^-1 at the residual's phi
    tau = _mv3(A_p, tp)

    # se3_Jl_inv(r) = [[A, -A Q A], [0, A]]
    Q = _calcQ(tau, phi)
    B = _mscale(-1.0, _mm3(_mm3(A_p, Q), A_p))

    # Adj(M) = [[R, skew(tm) R], [0, R]]
    R = _quat2R(qm)
    S = _mm3(_skew(tm), R)

    TL = _mm3(A_p, R)               # top-left  = bottom-right
    TR = _madd(_mm3(A_p, S), _mm3(B, R))

    # assemble r [E, 6] and Jj [E, 6, 6] (single materialization each)
    r = jnp.stack(tau + phi, axis=-1)
    zero = jnp.zeros_like(TL[0][0])
    rows = []
    for i in range(3):
        rows.append(jnp.stack(
            [TL[i][0], TL[i][1], TL[i][2],
             TR[i][0], TR[i][1], TR[i][2]], axis=-1))
    for i in range(3):
        rows.append(jnp.stack(
            [zero, zero, zero,
             TL[i][0], TL[i][1], TL[i][2]], axis=-1))
    Jj = jnp.stack(rows, axis=-2)                    # [E, 6, 6]
    J = jnp.stack([-Jj, Jj], axis=-2)                # [E, 6, 2, 6]
    return r, J


def bal_reproj_blocks(Tc, Xp, cams, pix):
    """Residual + closed-form tangent Jacobians for a batch of BAL
    reprojection observations, all intermediates [O]-shaped.

    Math (matches ``optim.ba.reproj_residual_bal``): with the camera
    point ``Xc = R(q) X + t``, BAL projects ``p = -Xc_xy / Xc_z`` and
    distorts radially, ``res = f (1 + k1 r2 + k2 r2^2) p - pix``.
    Left-perturbation chain rule (``pose.add(eps) = Exp(eps) pose``):
    ``dXc/d[tau, phi] = [I, -skew(Xc)]`` and ``dXc/dX = R(q)``.

    Args:
        Tc: [O, 7] SE3 storage of the observing cameras.
        Xp: [O, 3] world points.
        cams: [O, 3] BAL intrinsics (f, k1, k2).
        pix: [O, 2] observed pixels.

    Returns:
        (r [O, 2], Jc [O, 2, 6], Jp [O, 2, 3]).
    """
    t = (Tc[..., 0], Tc[..., 1], Tc[..., 2])
    q = (Tc[..., 3], Tc[..., 4], Tc[..., 5], Tc[..., 6])
    X = (Xp[..., 0], Xp[..., 1], Xp[..., 2])
    f, k1, k2 = cams[..., 0], cams[..., 1], cams[..., 2]

    R = _quat2R(q)
    RX = _mv3(R, X)
    xc, yc, zc = (a + b for a, b in zip(RX, t))   # Xc = R X + t
    iz = 1.0 / zc
    px = -xc * iz
    py = -yc * iz
    r2 = px * px + py * py
    dist = 1.0 + k1 * r2 + k2 * r2 * r2
    rx = f * dist * px - pix[..., 0]
    ry = f * dist * py - pix[..., 1]

    # dres/dp = f [dist I + 2 (k1 + 2 k2 r2) p p^T]   (2x2)
    g = 2.0 * (k1 + 2.0 * k2 * r2)
    a00 = f * (dist + g * px * px)
    a01 = f * (g * px * py)
    a11 = f * (dist + g * py * py)

    # dp/dXc = [[-iz, 0, -px*iz], [0, -iz, -py*iz]]   (2x3)
    # (px = -xc/z  =>  dpx/dz = xc/z^2 = -px/z)
    # Jpix = dres/dp @ dp/dXc                         (2x3)
    b00 = -a00 * iz
    b01 = -a01 * iz
    b02 = -(a00 * px + a01 * py) * iz
    b10 = -a01 * iz
    b11 = -a11 * iz
    b12 = -(a01 * px + a11 * py) * iz
    Jpix = ((b00, b01, b02), (b10, b11, b12))

    # Jc = Jpix @ [I | -skew(Xc)]  (2x6): translation part is Jpix itself,
    # rotation part is Jpix @ (-skew(Xc))
    Xc = (xc, yc, zc)
    mskew = _mscale(-1.0, _skew(Xc))
    rot0 = tuple(sum(Jpix[0][k] * mskew[k][j] for k in range(3))
                 for j in range(3))
    rot1 = tuple(sum(Jpix[1][k] * mskew[k][j] for k in range(3))
                 for j in range(3))
    Jc = jnp.stack([
        jnp.stack(Jpix[0] + rot0, axis=-1),
        jnp.stack(Jpix[1] + rot1, axis=-1)], axis=-2)        # [O, 2, 6]

    # Jp = Jpix @ R   (2x3)
    jp0 = tuple(sum(Jpix[0][k] * R[k][j] for k in range(3)) for j in range(3))
    jp1 = tuple(sum(Jpix[1][k] * R[k][j] for k in range(3)) for j in range(3))
    Jp = jnp.stack([jnp.stack(jp0, axis=-1),
                    jnp.stack(jp1, axis=-1)], axis=-2)       # [O, 2, 3]

    r = jnp.stack([rx, ry], axis=-1)
    return r, Jc, Jp
