r"""Lie-group math kernels with analytic forward/reverse AD rules.

TPU-native redesign of pypose's 40 ``torch.autograd.Function`` kernels
(reference: pypose/lietensor/operation.py:304-1113).  Each op is a pure
``jnp`` function wrapped in :func:`jax.custom_jvp`.  The JVP rules implement
the *left-trivialized tangent convention* used by the reference:

* a Lie-group-valued array ``X`` (storage shape ``(*, D)``) carries a tangent
  ``dX`` of the same storage shape whose first ``m`` entries (``m`` = manifold
  dim) are the left perturbation :math:`\delta` with
  :math:`\dot X = \frac{d}{dt}\mathrm{Exp}(t\delta)X|_{t=0}`, and whose
  remaining entries are zero;
* Euclidean arrays (points, algebra vectors) carry ordinary tangents.

JAX derives reverse-mode by transposing these linear JVPs, which reproduces
the reference's analytic ``backward`` rules exactly (e.g. ``so3_Exp`` pullback
``g -> g[..., :3] @ Jl`` — operation.py:365-370), while forward-mode (jacfwd)
comes for free.  Everything composes with ``jit``/``vmap``/``grad`` with no
``generate_vmap_rule``/``broadcast_inputs`` machinery: jnp broadcasting over
leading batch dims replaces the reference's flatten-to-2D path
(operation.py:1116-1125).

Storage conventions (identical to the reference):

====== ======= ==========================================
group  storage layout
====== ======= ==========================================
SO3    4       ``[qx, qy, qz, qw]``
so3    3       ``[px, py, pz]`` (axis-angle)
SE3    7       ``[tx, ty, tz, qx, qy, qz, qw]``
se3    6       ``[tau(3), phi(3)]``
RxSO3  5       ``[qx, qy, qz, qw, s]``
rxso3  4       ``[phi(3), sigma]``
Sim3   8       ``[t(3), q(4), s]``
sim3   7       ``[tau(3), phi(3), sigma]``
====== ======= ==========================================
"""

import jax
import jax.numpy as jnp

from .jacobian import (
    vec2skew, so3_Jl, so3_Jl_inv, so3_adj, calcQ, se3_Jl, se3_Jl_inv,
    se3_adj, rxso3_Ws, rxso3_Jl, rxso3_Jl_inv, rxso3_adj, sim3_adj,
    sim3_Jl, sim3_Jl_inv, sinc1, cosc, _theta, _guard, _CUT,
    so3_Jl_apply, so3_Jl_inv_apply, se3_Jl_apply, se3_Jl_inv_apply,
    rxso3_Ws_apply, so3_adj_apply, se3_adj_apply, rxso3_adj_apply,
    sim3_adj_apply,
)


_HI = jax.lax.Precision.HIGHEST


def _mv(M, v):
    """Batched matrix-vector product with full broadcasting (full f32
    precision: these feed every analytic AD rule)."""
    return jnp.einsum('...ij,...j->...i', M, v, precision=_HI)


def _vm(v, M):
    return jnp.einsum('...i,...ij->...j', v, M, precision=_HI)


def _pad(tan, out):
    """Embed a manifold tangent into the storage shape of ``out`` (zero tail)."""
    b = jnp.broadcast_shapes(tan.shape[:-1], out.shape[:-1])
    tan = jnp.broadcast_to(tan, b + tan.shape[-1:])
    pad = out.shape[-1] - tan.shape[-1]
    if pad == 0:
        return tan
    return jnp.concatenate(
        [tan, jnp.zeros(tan.shape[:-1] + (pad,), dtype=tan.dtype)], axis=-1)


def _bcast(t, out):
    return jnp.broadcast_to(t, out.shape)


# ---------------------------------------------------------------------------
# quaternion primitives (xyzw layout)
# ---------------------------------------------------------------------------

def _qmul(X, Y):
    Xv, Xw = X[..., :3], X[..., 3:4]
    Yv, Yw = Y[..., :3], Y[..., 3:4]
    Zv = Xw * Yv + Xv * Yw + jnp.cross(Xv, Yv)
    Zw = Xw * Yw - jnp.sum(Xv * Yv, axis=-1, keepdims=True)
    return jnp.concatenate([Zv, Zw], axis=-1)


def _qconj(X):
    return jnp.concatenate([-X[..., :3], X[..., 3:4]], axis=-1)


def _qrot(X, p):
    """Rotate point(s) p by unit quaternion X: two cross products.

    Ref: operation.py:516-524 (SO3_Act forward).
    """
    Xv, Xw = X[..., :3], X[..., 3:4]
    b = jnp.broadcast_shapes(Xv.shape[:-1], p.shape[:-1])
    Xv = jnp.broadcast_to(Xv, b + (3,))
    p = jnp.broadcast_to(p, b + (3,))
    uv = 2.0 * jnp.cross(Xv, p)
    return p + jnp.broadcast_to(Xw, b + (1,)) * uv + jnp.cross(Xv, uv)


# ---------------------------------------------------------------------------
# group-adjoint APPLY forms (no [*, d, d] matrix is ever built — the
# (8,128)-tile padding on two-small-minor-dim temps costs ~100x the
# logical HBM bytes; see jacobian.py header note)
# ---------------------------------------------------------------------------

def _SE3_Adj_apply(X, v):
    """``SE3_Adj(X) @ v`` = [R v1 + t x (R v2), R v2]."""
    t, q = X[..., :3], X[..., 3:7]
    Rv2 = _qrot(q, v[..., 3:6])
    return jnp.concatenate(
        [_qrot(q, v[..., :3]) + jnp.cross(t, Rv2), Rv2], axis=-1)


def _RxSO3_Adj_apply(X, v):
    """``RxSO3_Adj(X) @ v`` — Adj = blockdiag(R, 1)."""
    return jnp.concatenate(
        [_qrot(X[..., :4], v[..., :3]), v[..., 3:4]], axis=-1)


def _Sim3_Adj_apply(X, v):
    """``Sim3_Adj(X) @ v`` = [s R v1 + t x (R v2) - t v3, R v2, v3]."""
    t, q, s = X[..., :3], X[..., 3:7], X[..., 7:8]
    Rv2 = _qrot(q, v[..., 3:6])
    top = (s * _qrot(q, v[..., :3]) + jnp.cross(t, Rv2)
           - t * v[..., 6:7])
    return jnp.concatenate([top, Rv2, v[..., 6:7]], axis=-1)


# ---------------------------------------------------------------------------
# group matrices / adjoints / action Jacobians (plain functions)
# Ref: operation.py:175-301
# ---------------------------------------------------------------------------

def SO3_Adj(X):
    """Rotation matrix from unit quaternion (= adjoint of SO3)."""
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), X.shape[:-1] + (3, 3))
    Xv, Xw = X[..., :3], X[..., 3:4]
    Xw33 = Xw[..., None] * I3
    return (2.0 * Xw[..., None] * (Xw33 + vec2skew(Xv)) - I3
            + 2.0 * Xv[..., None] * Xv[..., None, :])


def SO3_Matrix(X):
    return SO3_Adj(X)


def SO3_Act_Jacobian(p):
    return vec2skew(-p)


def SO3_Matrix4x4(X):
    T = jnp.broadcast_to(jnp.eye(4, dtype=X.dtype), X.shape[:-1] + (4, 4))
    return T.at[..., :3, :3].set(SO3_Matrix(X))


def SO3_Act4_Jacobian(p):
    J = jnp.zeros(p.shape[:-1] + (4, 3), dtype=p.dtype)
    return J.at[..., :3, :3].set(SO3_Act_Jacobian(p[..., :3]))


def SE3_Adj(X):
    t, q = X[..., :3], X[..., 3:7]
    R = SO3_Adj(q)
    tR = jnp.matmul(vec2skew(t), R, precision=_HI)
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def SE3_Matrix(X):
    T = jnp.broadcast_to(jnp.eye(4, dtype=X.dtype), X.shape[:-1] + (4, 4))
    T = T.at[..., :3, :3].set(SO3_Matrix(X[..., 3:7]))
    return T.at[..., :3, 3].set(X[..., :3])


def SE3_Act_Jacobian(p):
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), p.shape[:-1] + (3, 3))
    return jnp.concatenate([I3, vec2skew(-p)], axis=-1)


def SE3_Matrix4x4(X):
    return SE3_Matrix(X)


def SE3_Act4_Jacobian(p):
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), p.shape[:-1] + (3, 3))
    J = jnp.zeros(p.shape[:-1] + (4, 6), dtype=p.dtype)
    J = J.at[..., :3, :3].set(I3 * p[..., 3:4, None])
    return J.at[..., :3, 3:].set(vec2skew(-p[..., :3]))


def RxSO3_Adj(X):
    A = jnp.broadcast_to(jnp.eye(4, dtype=X.dtype), X.shape[:-1] + (4, 4))
    return A.at[..., :3, :3].set(SO3_Adj(X[..., :4]))


def RxSO3_Matrix(X):
    return X[..., 4:5, None] * SO3_Adj(X[..., :4])


def RxSO3_Rotation(X):
    return SO3_Adj(X[..., :4])


def RxSO3_Act_Jacobian(p):
    return jnp.concatenate([vec2skew(-p), p[..., None]], axis=-1)


def RxSO3_Matrix4x4(X):
    T = jnp.broadcast_to(jnp.eye(4, dtype=X.dtype), X.shape[:-1] + (4, 4))
    return T.at[..., :3, :3].set(RxSO3_Matrix(X))


def RxSO3_Act4_Jacobian(p):
    J = jnp.zeros(p.shape[:-1] + (4, 4), dtype=p.dtype)
    J = J.at[..., :3, :3].set(SO3_Act_Jacobian(p[..., :3]))
    return J.at[..., :3, 3].set(p[..., :3])


def Sim3_Adj(X):
    Adj = jnp.broadcast_to(jnp.eye(7, dtype=X.dtype), X.shape[:-1] + (7, 7))
    R = RxSO3_Rotation(X[..., 3:])
    tx = vec2skew(X[..., :3])
    Adj = Adj.at[..., :3, :3].set(RxSO3_Matrix(X[..., 3:]))
    Adj = Adj.at[..., :3, 3:6].set(jnp.matmul(tx, R, precision=_HI))
    Adj = Adj.at[..., :3, 6].set(-X[..., :3])
    return Adj.at[..., 3:6, 3:6].set(R)


def Sim3_Matrix(X):
    T = jnp.broadcast_to(jnp.eye(4, dtype=X.dtype), X.shape[:-1] + (4, 4))
    T = T.at[..., :3, :3].set(RxSO3_Matrix(X[..., 3:]))
    return T.at[..., :3, 3].set(X[..., :3])


def Sim3_Act_Jacobian(p):
    return jnp.concatenate([SE3_Act_Jacobian(p), p[..., None]], axis=-1)


def Sim3_Matrix4x4(X):
    return Sim3_Matrix(X)


def Sim3_Act4_Jacobian(p):
    J = jnp.zeros(p.shape[:-1] + (4, 7), dtype=p.dtype)
    J = J.at[..., :, :6].set(SE3_Act4_Jacobian(p))
    return J.at[..., :3, 6].set(p[..., :3])


# ---------------------------------------------------------------------------
# Exp / Log
# ---------------------------------------------------------------------------

@jax.custom_jvp
def so3_Exp(x):
    """so3 -> SO3 quaternion exp.  Ref: operation.py:340-357.

    q = [x * sin(t/2)/t, cos(t/2)], Taylor-switched near t = 0.
    """
    theta, _ = _theta(x)
    half = 0.5 * theta
    imag = 0.5 * sinc1(half)          # sin(t/2)/t
    real = jnp.cos(half)
    return jnp.concatenate([x * imag, real], axis=-1)


@so3_Exp.defjvp
def _so3_Exp_jvp(primals, tangents):
    x, = primals
    dx, = tangents
    out = so3_Exp(x)
    tan = so3_Jl_apply(x, dx)
    return out, _pad(tan, out)


@jax.custom_jvp
def SO3_Log(X):
    """SO3 quaternion -> so3 log.  Ref: operation.py:304-324.

    Shortest-arc log with the reference's three-branch factor:
    2*atan(|v|/w)/|v| when both |v|, |w| large; sign(w)*pi/|v| when w ~ 0;
    2/w - 2|v|^2/(3 w^3) when |v| ~ 0.
    """
    v, w = X[..., :3], X[..., 3:4]
    v2 = jnp.sum(v * v, axis=-1, keepdims=True)
    vn = jnp.sqrt(jnp.maximum(v2, 1e-36))
    eps = jnp.asarray(jnp.finfo(X.dtype).eps, X.dtype)
    v_big = vn > eps
    w_big = jnp.abs(w) > eps
    w_safe = jnp.where(w_big, w, jnp.ones_like(w))
    vn_safe = jnp.where(v_big, vn, jnp.ones_like(vn))
    # main branch: 2*atan2(|v|, w)/|v| maps to (-pi, pi] automatically for
    # w < 0 as well; equals the reference's 2*atan(|v|/w)/|v| branch combined
    # with its sign(w)*pi/|v| (w ~ 0) branch.
    factor_main = 2.0 * jnp.arctan2(vn, w) / vn_safe
    # keep the same quaternion double-cover choice as the reference:
    # reference uses atan(|v|/w) (odd in w), i.e. angle in (-pi/2, pi/2] times
    # 2 -> (-pi, pi]; atan2(|v|, w) gives [0, pi); for w<0 the reference
    # returns negative angles.  atan(|v|/w) = atan2(|v|, w) - pi for w < 0.
    factor_main = jnp.where(w < 0, factor_main - 2.0 * jnp.pi / vn_safe,
                            factor_main)
    factor_small_v = 2.0 / w_safe - 2.0 * v2 / (3.0 * w_safe ** 3)
    factor = jnp.where(v_big, factor_main, factor_small_v)
    return factor * v


@SO3_Log.defjvp
def _SO3_Log_jvp(primals, tangents):
    X, = primals
    dX, = tangents
    out = SO3_Log(X)
    tan = so3_Jl_inv_apply(out, dX[..., :3])
    return out, _bcast(tan, out)


@jax.custom_jvp
def se3_Exp(x):
    """se3 -> SE3.  t = Jl(phi) tau, q = Exp(phi).  Ref: operation.py:398-418."""
    tau, phi = x[..., :3], x[..., 3:6]
    t = so3_Jl_apply(phi, tau)
    q = so3_Exp(phi)
    return jnp.concatenate([t, q], axis=-1)


@se3_Exp.defjvp
def _se3_Exp_jvp(primals, tangents):
    x, = primals
    dx, = tangents
    out = se3_Exp(x)
    tan = se3_Jl_apply(x, dx)
    return out, _pad(tan, out)


@jax.custom_jvp
def SE3_Log(X):
    """SE3 -> se3.  phi = Log(q), tau = Jl_inv(phi) t.  Ref: operation.py:373-395."""
    phi = SO3_Log(X[..., 3:7])
    tau = so3_Jl_inv_apply(phi, X[..., :3])
    return jnp.concatenate([tau, phi], axis=-1)


@SE3_Log.defjvp
def _SE3_Log_jvp(primals, tangents):
    X, = primals
    dX, = tangents
    out = SE3_Log(X)
    tan = se3_Jl_inv_apply(out, dX[..., :6])
    return out, _bcast(tan, out)


@jax.custom_jvp
def rxso3_Exp(x):
    """rxso3 -> RxSO3.  q = Exp(phi), s = exp(sigma).  Ref: operation.py:444-464."""
    q = so3_Exp(x[..., :3])
    s = jnp.exp(x[..., 3:4])
    return jnp.concatenate([q, s], axis=-1)


@rxso3_Exp.defjvp
def _rxso3_Exp_jvp(primals, tangents):
    x, = primals
    dx, = tangents
    out = rxso3_Exp(x)
    tan = jnp.concatenate(
        [so3_Jl_apply(x[..., :3], dx[..., :3]), dx[..., 3:4]], axis=-1)
    return out, _pad(tan, out)


@jax.custom_jvp
def RxSO3_Log(X):
    """RxSO3 -> rxso3.  Ref: operation.py:421-441."""
    phi = SO3_Log(X[..., :4])
    sigma = jnp.log(X[..., 4:5])
    return jnp.concatenate([phi, sigma], axis=-1)


@RxSO3_Log.defjvp
def _RxSO3_Log_jvp(primals, tangents):
    X, = primals
    dX, = tangents
    out = RxSO3_Log(X)
    tan = jnp.concatenate(
        [so3_Jl_inv_apply(out[..., :3], dX[..., :3]), dX[..., 3:4]],
        axis=-1)
    return out, _bcast(tan, out)


@jax.custom_jvp
def sim3_Exp(x):
    """sim3 -> Sim3.  t = Ws(phi, sigma) tau.  Ref: operation.py:492-513."""
    t = rxso3_Ws_apply(x[..., 3:7], x[..., :3])
    qs = rxso3_Exp(x[..., 3:7])
    return jnp.concatenate([t, qs], axis=-1)


@sim3_Exp.defjvp
def _sim3_Exp_jvp(primals, tangents):
    x, = primals
    dx, = tangents
    out = sim3_Exp(x)
    tan = _mv(sim3_Jl(x), dx)
    return out, _pad(tan, out)


@jax.custom_jvp
def Sim3_Log(X):
    """Sim3 -> sim3.  tau = Ws(phi, sigma)^{-1} t.  Ref: operation.py:467-489."""
    phi_sigma = RxSO3_Log(X[..., 3:8])
    Ws = rxso3_Ws(phi_sigma)
    tau = jnp.linalg.solve(Ws, X[..., :3, None])[..., 0]
    return jnp.concatenate([tau, phi_sigma], axis=-1)


@Sim3_Log.defjvp
def _Sim3_Log_jvp(primals, tangents):
    X, = primals
    dX, = tangents
    out = Sim3_Log(X)
    tan = _mv(sim3_Jl_inv(out), dX[..., :7])
    return out, _bcast(tan, out)


# ---------------------------------------------------------------------------
# Act (3-points and homogeneous 4-points)
# ---------------------------------------------------------------------------

@jax.custom_jvp
def SO3_Act(X, p):
    """Rotate p by X.  Ref: operation.py:516-542."""
    return _qrot(X, p)


@SO3_Act.defjvp
def _SO3_Act_jvp(primals, tangents):
    X, p = primals
    dX, dp = tangents
    out = SO3_Act(X, p)
    tan = jnp.cross(dX[..., :3], out) + _qrot(X, dp)
    return out, _bcast(tan, out)


@jax.custom_jvp
def SE3_Act(X, p):
    """out = R p + t.  Ref: operation.py:545-568."""
    return X[..., :3] + _qrot(X[..., 3:7], p)


@SE3_Act.defjvp
def _SE3_Act_jvp(primals, tangents):
    X, p = primals
    dX, dp = tangents
    out = SE3_Act(X, p)
    tan = (dX[..., :3] + jnp.cross(dX[..., 3:6], out)
           + _qrot(X[..., 3:7], dp))
    return out, _bcast(tan, out)


@jax.custom_jvp
def RxSO3_Act(X, p):
    """out = s R p.  Ref: operation.py:571-594."""
    return X[..., 4:5] * _qrot(X[..., :4], p)


@RxSO3_Act.defjvp
def _RxSO3_Act_jvp(primals, tangents):
    X, p = primals
    dX, dp = tangents
    out = RxSO3_Act(X, p)
    tan = (jnp.cross(dX[..., :3], out) + out * dX[..., 3:4]
           + X[..., 4:5] * _qrot(X[..., :4], dp))
    return out, _bcast(tan, out)


@jax.custom_jvp
def Sim3_Act(X, p):
    """out = s R p + t.  Ref: operation.py:597-620."""
    return X[..., :3] + RxSO3_Act(X[..., 3:8], p)


@Sim3_Act.defjvp
def _Sim3_Act_jvp(primals, tangents):
    X, p = primals
    dX, dp = tangents
    out = Sim3_Act(X, p)
    tan = (dX[..., :3] + jnp.cross(dX[..., 3:6], out)
           + out * dX[..., 6:7]
           + X[..., 7:8] * _qrot(X[..., 3:7], dp))
    return out, _bcast(tan, out)


@jax.custom_jvp
def SO3_Act4(X, p):
    """Ref: operation.py:623-645."""
    return jnp.concatenate([_qrot(X, p[..., :3]),
                            jnp.broadcast_to(p[..., 3:4],
                                             jnp.broadcast_shapes(
                                                 X.shape[:-1], p.shape[:-1])
                                             + (1,))], axis=-1)


@SO3_Act4.defjvp
def _SO3_Act4_jvp(primals, tangents):
    X, p = primals
    dX, dp = tangents
    out = SO3_Act4(X, p)
    top = jnp.cross(dX[..., :3], out[..., :3]) + _qrot(X, dp[..., :3])
    tan = jnp.concatenate([top, dp[..., 3:4]], axis=-1)
    return out, _bcast(tan, out)


@jax.custom_jvp
def SE3_Act4(X, p):
    """t' = R p3 + t pw; w' = pw.  Ref: operation.py:648-671."""
    t = _qrot(X[..., 3:7], p[..., :3]) + X[..., :3] * p[..., 3:4]
    b = t.shape[:-1]
    return jnp.concatenate([t, jnp.broadcast_to(p[..., 3:4], b + (1,))],
                           axis=-1)


@SE3_Act4.defjvp
def _SE3_Act4_jvp(primals, tangents):
    X, p = primals
    dX, dp = tangents
    out = SE3_Act4(X, p)
    top = (out[..., 3:4] * dX[..., :3]
           + jnp.cross(dX[..., 3:6], out[..., :3])
           + _qrot(X[..., 3:7], dp[..., :3]) + X[..., :3] * dp[..., 3:4])
    tan = jnp.concatenate([top, dp[..., 3:4]], axis=-1)
    return out, _bcast(tan, out)


@jax.custom_jvp
def RxSO3_Act4(X, p):
    """Ref: operation.py:674-696."""
    t = RxSO3_Act(X, p[..., :3])
    b = t.shape[:-1]
    return jnp.concatenate([t, jnp.broadcast_to(p[..., 3:4], b + (1,))],
                           axis=-1)


@RxSO3_Act4.defjvp
def _RxSO3_Act4_jvp(primals, tangents):
    X, p = primals
    dX, dp = tangents
    out = RxSO3_Act4(X, p)
    top = (jnp.cross(dX[..., :3], out[..., :3])
           + out[..., :3] * dX[..., 3:4]
           + X[..., 4:5] * _qrot(X[..., :4], dp[..., :3]))
    tan = jnp.concatenate([top, dp[..., 3:4]], axis=-1)
    return out, _bcast(tan, out)


@jax.custom_jvp
def Sim3_Act4(X, p):
    """Ref: operation.py:699-722."""
    t = RxSO3_Act(X[..., 3:8], p[..., :3]) + X[..., :3] * p[..., 3:4]
    b = t.shape[:-1]
    return jnp.concatenate([t, jnp.broadcast_to(p[..., 3:4], b + (1,))],
                           axis=-1)


@Sim3_Act4.defjvp
def _Sim3_Act4_jvp(primals, tangents):
    X, p = primals
    dX, dp = tangents
    out = Sim3_Act4(X, p)
    top = (out[..., 3:4] * dX[..., :3]
           + jnp.cross(dX[..., 3:6], out[..., :3])
           + out[..., :3] * dX[..., 6:7]
           + X[..., 7:8] * _qrot(X[..., 3:7], dp[..., :3])
           + X[..., :3] * dp[..., 3:4])
    tan = jnp.concatenate([top, dp[..., 3:4]], axis=-1)
    return out, _bcast(tan, out)


# ---------------------------------------------------------------------------
# Mul
# ---------------------------------------------------------------------------

@jax.custom_jvp
def SO3_Mul(X, Y):
    """Quaternion product.  Ref: operation.py:829-852."""
    return _qmul(X, Y)


@SO3_Mul.defjvp
def _SO3_Mul_jvp(primals, tangents):
    X, Y = primals
    dX, dY = tangents
    out = SO3_Mul(X, Y)
    tan = dX[..., :3] + _qrot(X, dY[..., :3])
    return out, _pad(tan, out)


@jax.custom_jvp
def SE3_Mul(X, Y):
    """Ref: operation.py:855-877."""
    t = X[..., :3] + _qrot(X[..., 3:7], Y[..., :3])
    q = _qmul(X[..., 3:7], Y[..., 3:7])
    b = jnp.broadcast_shapes(t.shape[:-1], q.shape[:-1])
    return jnp.concatenate([jnp.broadcast_to(t, b + (3,)),
                            jnp.broadcast_to(q, b + (4,))], axis=-1)


@SE3_Mul.defjvp
def _SE3_Mul_jvp(primals, tangents):
    X, Y = primals
    dX, dY = tangents
    out = SE3_Mul(X, Y)
    tan = dX[..., :6] + _SE3_Adj_apply(X, dY[..., :6])
    return out, _pad(tan, out)


@jax.custom_jvp
def RxSO3_Mul(X, Y):
    """Ref: operation.py:880-902."""
    q = _qmul(X[..., :4], Y[..., :4])
    s = X[..., 4:5] * Y[..., 4:5]
    b = jnp.broadcast_shapes(q.shape[:-1], s.shape[:-1])
    return jnp.concatenate([jnp.broadcast_to(q, b + (4,)),
                            jnp.broadcast_to(s, b + (1,))], axis=-1)


@RxSO3_Mul.defjvp
def _RxSO3_Mul_jvp(primals, tangents):
    X, Y = primals
    dX, dY = tangents
    out = RxSO3_Mul(X, Y)
    tan = dX[..., :4] + _RxSO3_Adj_apply(X, dY[..., :4])
    return out, _pad(tan, out)


@jax.custom_jvp
def Sim3_Mul(X, Y):
    """Ref: operation.py:905-927."""
    t = X[..., :3] + RxSO3_Act(X[..., 3:8], Y[..., :3])
    qs = RxSO3_Mul(X[..., 3:8], Y[..., 3:8])
    b = jnp.broadcast_shapes(t.shape[:-1], qs.shape[:-1])
    return jnp.concatenate([jnp.broadcast_to(t, b + (3,)),
                            jnp.broadcast_to(qs, b + (5,))], axis=-1)


@Sim3_Mul.defjvp
def _Sim3_Mul_jvp(primals, tangents):
    X, Y = primals
    dX, dY = tangents
    out = Sim3_Mul(X, Y)
    tan = dX[..., :7] + _Sim3_Adj_apply(X, dY[..., :7])
    return out, _pad(tan, out)


# ---------------------------------------------------------------------------
# Inv
# ---------------------------------------------------------------------------

@jax.custom_jvp
def SO3_Inv(X):
    """Ref: operation.py:930-949."""
    return _qconj(X)


@SO3_Inv.defjvp
def _SO3_Inv_jvp(primals, tangents):
    X, = primals
    dX, = tangents
    out = SO3_Inv(X)
    tan = -_qrot(out, dX[..., :3])
    return out, _pad(tan, out)


@jax.custom_jvp
def SE3_Inv(X):
    """Ref: operation.py:952-973."""
    q_inv = _qconj(X[..., 3:7])
    t_inv = -_qrot(q_inv, X[..., :3])
    return jnp.concatenate([t_inv, q_inv], axis=-1)


@SE3_Inv.defjvp
def _SE3_Inv_jvp(primals, tangents):
    X, = primals
    dX, = tangents
    out = SE3_Inv(X)
    tan = -_SE3_Adj_apply(out, dX[..., :6])
    return out, _pad(tan, out)


@jax.custom_jvp
def RxSO3_Inv(X):
    """Ref: operation.py:976-997."""
    q_inv = _qconj(X[..., :4])
    s_inv = 1.0 / X[..., 4:5]
    return jnp.concatenate([q_inv, s_inv], axis=-1)


@RxSO3_Inv.defjvp
def _RxSO3_Inv_jvp(primals, tangents):
    X, = primals
    dX, = tangents
    out = RxSO3_Inv(X)
    tan = -_RxSO3_Adj_apply(out, dX[..., :4])
    return out, _pad(tan, out)


@jax.custom_jvp
def Sim3_Inv(X):
    """Ref: operation.py:1000-1021."""
    qs_inv = jnp.concatenate([_qconj(X[..., 3:7]), 1.0 / X[..., 7:8]], axis=-1)
    t_inv = -RxSO3_Act(qs_inv, X[..., :3])
    return jnp.concatenate([t_inv, qs_inv], axis=-1)


@Sim3_Inv.defjvp
def _Sim3_Inv_jvp(primals, tangents):
    X, = primals
    dX, = tangents
    out = Sim3_Inv(X)
    tan = -_Sim3_Adj_apply(out, dX[..., :7])
    return out, _pad(tan, out)


# ---------------------------------------------------------------------------
# AdjXa / AdjTXa
# ---------------------------------------------------------------------------

def _make_adjxa(Adj_apply, adj_apply, tan_dim):
    @jax.custom_jvp
    def AdjXa(X, a):
        return Adj_apply(X, a)

    @AdjXa.defjvp
    def _jvp(primals, tangents):
        X, a = primals
        dX, da = tangents
        out = AdjXa(X, a)
        # out(t) = Adj(Exp(t d) X) a = Adj(Exp(t d)) out ; d/dt = ad(d) out
        # = -ad(out) d  (Ref backward: operation.py:743-748)
        tan = -adj_apply(out, dX[..., :tan_dim]) + Adj_apply(X, da)
        return out, _bcast(tan, out)

    return AdjXa


def _make_adjtxa(AdjXa_fn, Inv_fn, adj_apply, tan_dim):
    @jax.custom_jvp
    def AdjTXa(X, a):
        return AdjXa_fn(Inv_fn(X), a)

    @AdjTXa.defjvp
    def _jvp(primals, tangents):
        X, a = primals
        dX, da = tangents
        Xinv = Inv_fn(X)
        out = AdjXa_fn(Xinv, a)
        # out(t) = Adj(X^{-1} Exp(-t d)) a; d/dt = Adj(X^{-1}) ad(a) d
        tan = (AdjXa_fn(Xinv, adj_apply(a, dX[..., :tan_dim]))
               + AdjXa_fn(Xinv, da))
        return out, _bcast(tan, out)

    return AdjTXa


SO3_AdjXa = _make_adjxa(_qrot, so3_adj_apply, 3)
SE3_AdjXa = _make_adjxa(_SE3_Adj_apply, se3_adj_apply, 6)
RxSO3_AdjXa = _make_adjxa(_RxSO3_Adj_apply, rxso3_adj_apply, 4)
Sim3_AdjXa = _make_adjxa(_Sim3_Adj_apply, sim3_adj_apply, 7)

SO3_AdjTXa = _make_adjtxa(SO3_AdjXa, SO3_Inv, so3_adj_apply, 3)
SE3_AdjTXa = _make_adjtxa(SE3_AdjXa, SE3_Inv, se3_adj_apply, 6)
RxSO3_AdjTXa = _make_adjtxa(RxSO3_AdjXa, RxSO3_Inv, rxso3_adj_apply, 4)
Sim3_AdjTXa = _make_adjtxa(Sim3_AdjXa, Sim3_Inv, sim3_adj_apply, 7)


# ---------------------------------------------------------------------------
# Jinvp (inverse left Jacobian applied to a tangent vector)
# Ref: lietensor.py:257-264, 422-429, 556-563, 700-707
# ---------------------------------------------------------------------------

def SO3_Jinvp(X, p):
    return so3_Jl_inv_apply(SO3_Log(X), p)


def SE3_Jinvp(X, p):
    return se3_Jl_inv_apply(SE3_Log(X), p)


def RxSO3_Jinvp(X, p):
    phis = RxSO3_Log(X)
    return jnp.concatenate(
        [so3_Jl_inv_apply(phis[..., :3], p[..., :3]), p[..., 3:4]],
        axis=-1)


def Sim3_Jinvp(X, p):
    return _mv(sim3_Jl_inv(Sim3_Log(X)), p)
