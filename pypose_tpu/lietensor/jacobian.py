r"""Closed-form Lie-group Jacobian helpers (left Jacobians, adjoints, Q/Ws blocks).

TPU-native re-design of the coefficient math behind pypose's analytic
autograd rules (reference: pypose/lietensor/operation.py:7-172).  Instead of
boolean-mask indexing with ``torch.finfo(...).eps`` switches, every
coefficient is expressed through cancellation-free closed forms where they
exist (e.g. ``(1-cos\theta)/\theta^2 = 2\sin^2(\theta/2)/\theta^2``) plus a
Taylor branch selected by ``jnp.where`` with a *wide* cutoff chosen so the
truncated series is accurate to float32 machine precision on TPU.  All
functions are pure, shape-polymorphic over leading batch dims, and safe to
``jit``/``vmap``/differentiate (double-where guards keep gradients NaN-free).
"""

import jax
import jax.numpy as jnp

# TPU MXU defaults f32 matmuls to a single bf16 pass; every matrix product
# here feeds AD rules or Jacobian assembly, so force full f32 precision
# (negligible cost at 3x3..7x7).
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)

__all__ = [
    'vec2skew', 'so3_Jl', 'so3_Jl_inv', 'so3_Jr', 'so3_adj', 'calcQ',
    'se3_Jl', 'se3_Jl_inv', 'se3_adj', 'rxso3_Ws', 'rxso3_Jl', 'rxso3_Jl_inv',
    'rxso3_adj', 'sim3_adj', 'sim3_Jl', 'sim3_Jl_inv',
    'so3_Jl_apply', 'so3_Jl_inv_apply', 'calcQ_apply', 'se3_Jl_apply',
    'se3_Jl_inv_apply', 'rxso3_Ws_apply', 'so3_adj_apply', 'se3_adj_apply',
    'rxso3_adj_apply', 'sim3_adj_apply',
]

# Taylor-series switch points, per dtype.  Every truncated series below
# carries enough terms that at theta < cut the truncation error is below the
# dtype's machine precision, while the closed forms stay cancellation-free
# above the cut.
_CUT = 0.5


def _cut(x):
    return 0.25 if jnp.finfo(jnp.result_type(x)).bits >= 64 else _CUT


def _guard(pred, x, alt=1.0):
    """Replace ``x`` by ``alt`` where ``pred`` holds (double-where NaN guard)."""
    return jnp.where(pred, alt, x)


def vec2skew(v):
    """(*, 3) -> (*, 3, 3) skew-symmetric matrices. Ref: lietensor/basics.py:7-42."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([o, -z, y], axis=-1),
        jnp.stack([z, o, -x], axis=-1),
        jnp.stack([-y, x, o], axis=-1),
    ], axis=-2)


def _theta(x):
    """Rotation-angle magnitude with NaN-safe sqrt; returns (theta, theta2)."""
    theta2 = jnp.sum(x * x, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-36))
    return theta, theta2


# ---------------------------------------------------------------------------
# scalar coefficient functions of theta (all broadcast elementwise)
# ---------------------------------------------------------------------------

def sinc1(theta):
    """sin(t)/t with Taylor branch."""
    small = jnp.abs(theta) < _cut(theta)
    t = _guard(small, theta)
    t2 = theta * theta
    taylor = 1.0 - t2 / 6.0 * (1.0 - t2 / 20.0 * (
        1.0 - t2 / 42.0 * (1.0 - t2 / 72.0)))
    return jnp.where(small, taylor, jnp.sin(t) / t)


def cosc(theta):
    """(1 - cos t)/t^2 = 2 sin^2(t/2)/t^2 with Taylor branch."""
    small = jnp.abs(theta) < _cut(theta)
    t = _guard(small, theta)
    t2 = theta * theta
    taylor = 0.5 - t2 / 24.0 * (1.0 - t2 / 30.0 * (
        1.0 - t2 / 56.0 * (1.0 - t2 / 90.0)))
    s = jnp.sin(t / 2.0)
    return jnp.where(small, taylor, 2.0 * s * s / (t * t))


def sinc3(theta):
    """(t - sin t)/t^3 with Taylor branch."""
    small = jnp.abs(theta) < _cut(theta)
    t = _guard(small, theta)
    t2 = theta * theta
    taylor = (1.0 / 6.0) * (1.0 - t2 / 20.0 * (1.0 - t2 / 42.0 * (
        1.0 - t2 / 72.0 * (1.0 - t2 / 110.0))))
    return jnp.where(small, taylor, (t - jnp.sin(t)) / (t * t * t))


def coef_Jl_inv(theta):
    """(1 - (t/2) cot(t/2)) / t^2, the K@K coefficient of so3 Jl^{-1}."""
    small = jnp.abs(theta) < _cut(theta)
    t = _guard(small, theta)
    t2 = theta * theta
    taylor = (1.0 / 12.0) * (1.0 + t2 / 60.0 * (
        1.0 + t2 / 42.0 * (1.0 + t2 / 40.0)))
    half = t / 2.0
    exact = (1.0 - half * jnp.cos(half) / jnp.sin(half)) / (t * t)
    return jnp.where(small, taylor, exact)


def coefQ2(theta):
    """(t^2 + 2 cos t - 2) / (2 t^4)."""
    small = jnp.abs(theta) < 2.0 * _cut(theta)
    t = _guard(small, theta)
    t2 = theta * theta
    # series: 1/24 - t^2/720 + t^4/40320 - t^6/3628800 + t^8/958003200
    taylor = (1.0 / 24.0) * (1.0 - t2 / 30.0 * (1.0 - t2 / 56.0 * (
        1.0 - t2 / 90.0 * (1.0 - t2 / 264.0))))
    exact = (t * t + 2.0 * jnp.cos(t) - 2.0) / (2.0 * t ** 4)
    return jnp.where(small, taylor, exact)


def coefQ3(theta):
    """(2t - 3 sin t + t cos t) / (2 t^5)."""
    small = jnp.abs(theta) < 2.0 * _cut(theta)
    t = _guard(small, theta)
    t2 = theta * theta
    # series: 1/120 - t^2/2520 + t^4/120960 - t^6/9979200
    taylor = (1.0 / 120.0) * (1.0 - t2 / 21.0 * (1.0 - t2 / 48.0 * (
        1.0 - 2.0 * t2 / 165.0)))
    exact = (2.0 * t - 3.0 * jnp.sin(t) + t * jnp.cos(t)) / (2.0 * t ** 5)
    return jnp.where(small, taylor, exact)


# ---------------------------------------------------------------------------
# component (structure-of-[*batch]-vectors) helpers
#
# XLA tiles a buffer's two MINOR dims to (8, 128), so any [N, 3, 3] /
# [N, 6, 6] intermediate moves ~100x its logical bytes through HBM
# (measured r4, tools/microchain_prof.py: matrix-form calcQ 10.0 ms and
# se3_Jl 11.4 ms at N=1e5 vs a ~0.1 ms fused-elementwise budget).  The
# builders below therefore compute every ENTRY as a plain [*batch] array
# — tuples of scalars, cross-product identities instead of matmuls — and
# materialize exactly ONE stacked output.  The `*_apply` forms never
# build a matrix at all (pure jnp.cross chains on [*, 3] arrays); the
# hot custom_jvp rules in operation.py use those.
# ---------------------------------------------------------------------------

def _eye(x, n):
    batch = x.shape[:-1]
    return jnp.broadcast_to(jnp.eye(n, dtype=x.dtype), batch + (n, n))


def _tskew(v):
    x, y, z = v
    o = jnp.zeros_like(x)
    return ((o, -z, y), (z, o, -x), (-y, x, o))


def _tmm(A, B):
    return tuple(tuple(sum(A[i][k] * B[k][j] for k in range(3))
                       for j in range(3)) for i in range(3))


def _tadd(*Ms):
    return tuple(tuple(sum(M[i][j] for M in Ms) for j in range(3))
                 for i in range(3))


def _tscale(s, M):
    return tuple(tuple(s * M[i][j] for j in range(3)) for i in range(3))


def _tstack(rows):
    """Stack a list of row-tuples of [*batch] entries into one array."""
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def _theta_scalar(phi):
    """Angle as a plain [*batch] array from a 3-tuple of components."""
    return jnp.sqrt(jnp.maximum(
        phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2], 1e-36))


def _so3_Jl_t(phi):
    """so3_Jl as a 3x3 tuple: (1 - B th^2) I + A K + B phi phi^T
    (using K^2 = phi phi^T - th^2 I)."""
    th = _theta_scalar(phi)
    A, B = cosc(th), sinc3(th)
    x, y, z = phi
    d = 1.0 - B * th * th
    return ((d + B * x * x, -A * z + B * x * y, A * y + B * x * z),
            (A * z + B * x * y, d + B * y * y, -A * x + B * y * z),
            (-A * y + B * x * z, A * x + B * y * z, d + B * z * z))


def _so3_Jl_inv_t(phi):
    """so3_Jl_inv as a 3x3 tuple: (1 - C th^2) I - K/2 + C phi phi^T."""
    th = _theta_scalar(phi)
    C = coef_Jl_inv(th)
    x, y, z = phi
    d = 1.0 - C * th * th
    return ((d + C * x * x, 0.5 * z + C * x * y, -0.5 * y + C * x * z),
            (-0.5 * z + C * x * y, d + C * y * y, 0.5 * x + C * y * z),
            (0.5 * y + C * x * z, -0.5 * x + C * y * z, d + C * z * z))


def _calcQ_t(tau, phi):
    """calcQ as a 3x3 tuple (same coefficient chain as :func:`calcQ`)."""
    th = _theta_scalar(phi)
    Tau, Phi = _tskew(tau), _tskew(phi)
    c1, c2, c3 = sinc3(th), coefQ2(th), coefQ3(th)
    PT, TP = _tmm(Phi, Tau), _tmm(Tau, Phi)
    PTP = _tmm(PT, Phi)
    return _tadd(
        _tscale(0.5, Tau),
        _tscale(c1, _tadd(PT, TP, PTP)),
        _tscale(c2, _tadd(_tmm(Phi, PT), _tmm(TP, Phi),
                          _tscale(-3.0, PTP))),
        _tscale(c3, _tadd(_tmm(PTP, Phi), _tmm(Phi, PTP))))


def _unpack3(x):
    return (x[..., 0], x[..., 1], x[..., 2])


# ---------------------------------------------------------------------------
# so3 / SO3
# ---------------------------------------------------------------------------

def so3_Jl(x):
    """Left Jacobian of SO(3): I + A K + B K^2.  Ref: operation.py:7-20."""
    return _tstack(_so3_Jl_t(_unpack3(x)))


def so3_Jl_inv(x):
    """Inverse left Jacobian of SO(3).  Ref: operation.py:23-32."""
    return _tstack(_so3_Jl_inv_t(_unpack3(x)))


def so3_Jl_apply(x, v):
    """``so3_Jl(x) @ v`` without building the matrix:
    v + A (x x v) + B (x x (x x v))."""
    theta, _ = _theta(x)
    A, B = cosc(theta), sinc3(theta)
    xv = jnp.cross(x, v)
    return v + A * xv + B * jnp.cross(x, xv)


def so3_Jl_inv_apply(x, v):
    """``so3_Jl_inv(x) @ v`` without building the matrix."""
    theta, _ = _theta(x)
    C = coef_Jl_inv(theta)
    xv = jnp.cross(x, v)
    return v - 0.5 * xv + C * jnp.cross(x, xv)


def so3_Jr(x):
    """Right Jacobian of so(3): Jr(x) = Jl(-x).  Ref: lietensor.py:343-351."""
    return so3_Jl(-x)


def so3_adj(x):
    return vec2skew(x)


def so3_adj_apply(x, v):
    """``so3_adj(x) @ v = x x v`` (no matrix)."""
    return jnp.cross(x, v)


def se3_adj_apply(x, v):
    """``se3_adj(x) @ v`` — [[Phi, Tau], [0, Phi]] as cross products."""
    tau, phi = x[..., :3], x[..., 3:6]
    top = jnp.cross(phi, v[..., :3]) + jnp.cross(tau, v[..., 3:6])
    return jnp.concatenate([top, jnp.cross(phi, v[..., 3:6])], axis=-1)


def rxso3_adj_apply(x, v):
    """``rxso3_adj(x) @ v`` — only the skew(phi) block is nonzero."""
    top = jnp.cross(x[..., :3], v[..., :3])
    return jnp.concatenate(
        [top, jnp.zeros(top.shape[:-1] + (1,), top.dtype)], axis=-1)


def sim3_adj_apply(x, v):
    """``sim3_adj(x) @ v`` in component form (see :func:`sim3_adj`)."""
    tau, phi, sigma = x[..., :3], x[..., 3:6], x[..., 6:7]
    top = (jnp.cross(phi, v[..., :3]) + sigma * v[..., :3]
           + jnp.cross(tau, v[..., 3:6]) - tau * v[..., 6:7])
    mid = jnp.cross(phi, v[..., 3:6])
    return jnp.concatenate(
        [top, mid, jnp.zeros(top.shape[:-1] + (1,), top.dtype)], axis=-1)


# ---------------------------------------------------------------------------
# se3 (tangent order: [tau(3), phi(3)])
# ---------------------------------------------------------------------------

def calcQ(x):
    """Q block of the SE(3) left Jacobian.  Ref: operation.py:37-58."""
    return _tstack(_calcQ_t(_unpack3(x[..., :3]), _unpack3(x[..., 3:6])))


def calcQ_apply(tau, phi, v):
    """``calcQ([tau, phi]) @ v`` as a chain of cross products (no matrix)."""
    theta, _ = _theta(phi)
    c1, c2, c3 = sinc3(theta), coefQ2(theta), coefQ3(theta)
    tv = jnp.cross(tau, v)
    pv = jnp.cross(phi, v)
    ptv = jnp.cross(phi, tv)          # Phi Tau v
    tpv = jnp.cross(tau, pv)          # Tau Phi v
    ppv = jnp.cross(phi, pv)          # Phi Phi v
    ptpv = jnp.cross(phi, tpv)        # Phi Tau Phi v
    pptv = jnp.cross(phi, ptv)        # Phi Phi Tau v
    tppv = jnp.cross(tau, ppv)        # Tau Phi Phi v
    return (0.5 * tv + c1 * (ptv + tpv + ptpv)
            + c2 * (pptv + tppv - 3.0 * ptpv)
            + c3 * (jnp.cross(phi, tppv) + jnp.cross(phi, ptpv)))


def _se3_rows(TL, TR):
    """Assemble [[TL, TR], [0, TL]] rows from 3x3 tuples."""
    zero = jnp.zeros_like(TL[0][0])
    rows = [TL[i] + TR[i] for i in range(3)]
    rows += [(zero, zero, zero) + TL[i] for i in range(3)]
    return rows


def se3_Jl(x):
    """6x6 left Jacobian of SE(3): [[Jl, Q], [0, Jl]].  Ref: operation.py:61-65."""
    tau, phi = _unpack3(x[..., :3]), _unpack3(x[..., 3:6])
    return _tstack(_se3_rows(_so3_Jl_t(phi), _calcQ_t(tau, phi)))


def se3_Jl_inv(x):
    """Inverse 6x6 left Jacobian of SE(3).  Ref: operation.py:68-75."""
    tau, phi = _unpack3(x[..., :3]), _unpack3(x[..., 3:6])
    A = _so3_Jl_inv_t(phi)
    Q = _calcQ_t(tau, phi)
    B = _tscale(-1.0, _tmm(_tmm(A, Q), A))
    return _tstack(_se3_rows(A, B))


def se3_Jl_apply(x, v):
    """``se3_Jl(x) @ v`` without building the matrix:
    [[Jl, Q], [0, Jl]] @ [v1, v2] = [Jl v1 + Q v2, Jl v2]."""
    tau, phi = x[..., :3], x[..., 3:6]
    v1, v2 = v[..., :3], v[..., 3:6]
    top = so3_Jl_apply(phi, v1) + calcQ_apply(tau, phi, v2)
    return jnp.concatenate([top, so3_Jl_apply(phi, v2)], axis=-1)


def se3_Jl_inv_apply(x, v):
    """``se3_Jl_inv(x) @ v`` without building the matrix:
    [[A, -A Q A], [0, A]] @ [v1, v2] = [A (v1 - Q (A v2)), A v2]."""
    tau, phi = x[..., :3], x[..., 3:6]
    v1, v2 = v[..., :3], v[..., 3:6]
    Av2 = so3_Jl_inv_apply(phi, v2)
    top = so3_Jl_inv_apply(phi, v1 - calcQ_apply(tau, phi, Av2))
    return jnp.concatenate([top, Av2], axis=-1)


def se3_adj(x):
    """6x6 adjoint of se(3).  Ref: operation.py:77-83."""
    Phi = vec2skew(x[..., 3:6])
    Tau = vec2skew(x[..., :3])
    Z = jnp.zeros_like(Phi)
    top = jnp.concatenate([Phi, Tau], axis=-1)
    bot = jnp.concatenate([Z, Phi], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# rxso3 (tangent order: [phi(3), sigma(1)])
# ---------------------------------------------------------------------------

def _rxso3_Ws_coefs(x):
    r"""Coefficients (A, B, C) of the W(phi, sigma) matrix used by Sim(3)
    exp/log: W = A K + B K^2 + C I.  Ref: operation.py:85-129.

    W = A K + B K^2 + C I with K = skew(phi), defined by the integral
    :math:`W = \int_0^1 e^{s\sigma} \exp(s\hat\phi)\,ds`, i.e.

    .. math::
        C = \int_0^1 e^{s\sigma} ds,\quad
        A = \int_0^1 s\,e^{s\sigma}\,\mathrm{sinc}(s\theta) ds,\quad
        B = \int_0^1 s^2 e^{s\sigma}\,\frac{1-\cos(s\theta)}{(s\theta)^2} ds.

    Evaluated in three cancellation-free regimes (unlike the reference's
    four exact-at-zero eps branches, these stay accurate over the whole
    (sigma, theta) plane):

    1. theta >= cut: closed forms (stable for every sigma);
    2. theta < cut, |sigma| >= cut: theta-Taylor whose coefficients
       T_m = int s^{m-1} e^{s sigma} ds come from a stable upward recursion;
    3. both small: double power series.
    """
    phi, sigma = x[..., :3], x[..., 3]
    theta, _ = _theta(phi)
    theta = theta[..., 0]
    theta2 = theta * theta
    cut = _cut(x)

    t_small = theta < cut
    s_small = jnp.abs(sigma) < cut
    both_small = t_small & s_small

    # ---- C = expm1(sigma)/sigma (Taylor only to dodge 0/0) ----
    sig = _guard(s_small, sigma)
    C_taylor = 1.0 + sigma / 2.0 * (1.0 + sigma / 3.0 * (
        1.0 + sigma / 4.0 * (1.0 + sigma / 5.0 * (1.0 + sigma / 6.0))))
    C = jnp.where(s_small, C_taylor, jnp.expm1(sig) / sig)

    # ---- regime 1: theta >= cut (exact; safe for any sigma) ----
    th = _guard(t_small, theta)
    scale = jnp.exp(sigma)
    a = scale * jnp.sin(th)
    b = scale * jnp.cos(th)
    c = th * th + sigma * sigma
    A1 = (a * sigma + (1.0 - b) * th) / (th * c)
    B1 = (C - ((b - 1.0) * sigma + a * th) / c) / (th * th)

    # ---- regime 2: theta < cut, sigma >= cut ----
    # T_m = int_0^1 s^{m-1} e^{s sigma} ds;  T_m = (e^sigma - (m-1)T_{m-1})/sigma
    T1 = C
    T2 = (scale - T1) / sig
    T3 = (scale - 2.0 * T2) / sig
    T4 = (scale - 3.0 * T3) / sig
    T5 = (scale - 4.0 * T4) / sig
    T6 = (scale - 5.0 * T5) / sig
    T7 = (scale - 6.0 * T6) / sig
    T8 = (scale - 7.0 * T7) / sig
    T9 = (scale - 8.0 * T8) / sig
    theta4 = theta2 * theta2
    A2 = (T2 - theta2 / 6.0 * T4 + theta4 / 120.0 * T6
          - theta4 * theta2 / 5040.0 * T8)
    B2 = (0.5 * T3 - theta2 / 24.0 * T5 + theta4 / 720.0 * T7
          - theta4 * theta2 / 40320.0 * T9)

    # ---- regime 3: both small — double series ----
    # S_m = sum_k sigma^k / (k! (k+m)), truncated at k=8
    def S(m):
        acc = jnp.zeros_like(sigma)
        term = jnp.ones_like(sigma)  # sigma^k / k!
        for k in range(0, 9):
            acc = acc + term / (k + m)
            term = term * sigma / (k + 1)
        return acc

    A3 = (S(2) - theta2 / 6.0 * S(4) + theta4 / 120.0 * S(6)
          - theta4 * theta2 / 5040.0 * S(8))
    B3 = (0.5 * S(3) - theta2 / 24.0 * S(5) + theta4 / 720.0 * S(7)
          - theta4 * theta2 / 40320.0 * S(9))

    A = jnp.where(t_small, jnp.where(both_small, A3, A2), A1)
    B = jnp.where(t_small, jnp.where(both_small, B3, B2), B1)
    return A, B, C


def rxso3_Ws(x):
    """W matrix of Sim(3) exp/log — see :func:`_rxso3_Ws_coefs`.
    Component-built: A K + B (phi phi^T - th^2 I) + C I, one stack."""
    A, B, C = _rxso3_Ws_coefs(x)
    phi = _unpack3(x[..., :3])
    th = _theta_scalar(phi)
    px, py, pz = phi
    d = C - B * th * th
    return _tstack((
        (d + B * px * px, -A * pz + B * px * py, A * py + B * px * pz),
        (A * pz + B * px * py, d + B * py * py, -A * px + B * py * pz),
        (-A * py + B * px * pz, A * px + B * py * pz, d + B * pz * pz)))


def rxso3_Ws_apply(x, tau):
    """``rxso3_Ws(x) @ tau`` without building the matrix."""
    A, B, C = _rxso3_Ws_coefs(x)
    phi = x[..., :3]
    pt = jnp.cross(phi, tau)
    return (C[..., None] * tau + A[..., None] * pt
            + B[..., None] * jnp.cross(phi, pt))


def rxso3_Jl(x):
    """4x4 left Jacobian of RxSO(3) (rotation block only).  Ref: operation.py:132-135."""
    J = _eye(x, 4)
    return J.at[..., :3, :3].set(so3_Jl(x[..., :3]))


def rxso3_Jl_inv(x):
    J = _eye(x, 4)
    return J.at[..., :3, :3].set(so3_Jl_inv(x[..., :3]))


def rxso3_adj(x):
    """4x4 adjoint of rxso3.  Ref: operation.py:142-145."""
    A = jnp.zeros(x.shape[:-1] + (4, 4), dtype=x.dtype)
    return A.at[..., :3, :3].set(vec2skew(x[..., :3]))


# ---------------------------------------------------------------------------
# sim3 (tangent order: [tau(3), phi(3), sigma(1)])
# ---------------------------------------------------------------------------

def sim3_adj(x):
    """7x7 adjoint of sim3.  Ref: operation.py:147-156."""
    tau, phi, sigma = x[..., :3], x[..., 3:6], x[..., 6:7]
    Tau, Phi = vec2skew(tau), vec2skew(phi)
    I3 = _eye(tau, 3)
    ad = jnp.zeros(x.shape[:-1] + (7, 7), dtype=x.dtype)
    ad = ad.at[..., :3, :3].set(Phi + sigma[..., None] * I3)
    ad = ad.at[..., :3, 3:6].set(Tau)
    ad = ad.at[..., :3, 6].set(-tau)
    ad = ad.at[..., 3:6, 3:6].set(Phi)
    return ad


def _expint(A, n_sq=8, order=10):
    """T(A) = sum_{k>=0} A^k/(k+1)! = integral_0^1 exp(sA) ds, to machine
    precision at any norm, by scaling-and-squaring on the doubling
    identities T(2B) = T(B)(I + exp(B))/2 and exp(2B) = exp(B)^2 with
    exp(B) = I + B T(B).

    With n_sq=8 and a 10-term base series, the truncation error is
    ~(||A||/256)^11/12! — below f64 eps for ||A|| up to ~1e2.  The whole
    computation is a fixed chain of batched small matmuls (MXU-friendly,
    branch-free, AD-exact to all orders)."""
    d = A.shape[-1]
    I = jnp.broadcast_to(
        jnp.eye(d, dtype=A.dtype), A.shape)
    B = A * (0.5 ** n_sq)
    import math
    T = I / math.factorial(order + 1)
    for k in range(order - 1, -1, -1):
        T = I / math.factorial(k + 1) + _mm(B, T)
    E = I + _mm(B, T)
    for _ in range(n_sq):
        T = 0.5 * _mm(T, I + E)
        E = _mm(E, E)
    return T


def sim3_Jl(x):
    """Exact 7x7 left Jacobian of Sim(3): the adjoint integral
    T(ad(x)) = integral_0^1 exp(s ad) ds evaluated to machine precision
    via :func:`_expint` (scaling-and-squaring).

    The reference truncates the series at Xi^5/720 (operation.py:159-164),
    which degrades beyond tangent norm ~0.5; this is exact at any norm."""
    return _expint(sim3_adj(x))


def sim3_Jl_inv(x):
    """Exact inverse left Jacobian of Sim(3): solve against
    :func:`sim3_Jl` (well-conditioned for practical norms; differentiable
    through the batched LU solve).

    The reference truncates the Bernoulli series at Xi^4/720
    (operation.py:167-172)."""
    J = sim3_Jl(x)
    I7 = jnp.broadcast_to(jnp.eye(7, dtype=x.dtype), J.shape)
    return jnp.linalg.solve(J, I7)
