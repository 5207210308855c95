r"""Closed-form batched small-matrix inverses.

XLA lowers ``jnp.linalg.inv`` of batched 3x3s to LU with pivoting — far
slower than the adjugate form on TPU (pure VPU elementwise).  Used by the
Schur-complement BA's Hpp elimination and block-Jacobi preconditioners.
"""

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.einsum('...ij,...jk->...ik', a, b, precision=_HI)


def inv3x3(M, eps=0.0):
    """Adjugate-based batched 3x3 inverse: (*, 3, 3) -> (*, 3, 3)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-36, 1e-36, det) if eps == 0.0 else \
        det + eps
    inv_det = 1.0 / det
    adj = jnp.stack([
        jnp.stack([A, D, G], axis=-1),
        jnp.stack([B, E, H], axis=-1),
        jnp.stack([C, F, I], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def solve3x3(M, b):
    """Batched 3x3 solve via the adjugate inverse: (*, 3, 3), (*, 3)."""
    return jnp.einsum('...ij,...j->...i', inv3x3(M), b, precision=_HI)


def inv6x6(M):
    """Batched 6x6 inverse via 3x3-blockwise Schur complement.

    ~2.7x faster than jnp.linalg.inv's LU on TPU; accuracy is adequate for
    SPD (damped Hessian-block) inputs — intended for preconditioners and
    eliminations where the blocks are diagonally dominant.
    """
    A = M[..., :3, :3]
    B = M[..., :3, 3:]
    C = M[..., 3:, :3]
    D = M[..., 3:, 3:]
    Ai = inv3x3(A)
    AiB = _mm(Ai, B)
    CAi = _mm(C, Ai)
    S = D - _mm(C, AiB)
    Si = inv3x3(S)
    top = jnp.concatenate([Ai + _mm(_mm(AiB, Si), CAi), -_mm(AiB, Si)], axis=-1)
    bot = jnp.concatenate([-_mm(Si, CAi), Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def blockinv(M):
    """Dispatch: 3x3 / 6x6 closed forms, else jnp.linalg.inv."""
    n = M.shape[-1]
    if n == 3:
        return inv3x3(M)
    if n == 6:
        return inv6x6(M)
    return jnp.linalg.inv(M)


def chol3x3(A):
    """Batched closed-form lower Cholesky of 3x3 SPD matrices.

    Unrolled scalar recurrences (no LAPACK loop) — used by the dense-Schur
    BA path to split Hpp^-1 into L L^T so the reduced camera system can be
    formed as one Gram matmul.
    """
    a11 = jnp.sqrt(A[..., 0, 0])
    l21 = A[..., 1, 0] / a11
    l31 = A[..., 2, 0] / a11
    a22 = jnp.sqrt(A[..., 1, 1] - l21 * l21)
    l32 = (A[..., 2, 1] - l31 * l21) / a22
    a33 = jnp.sqrt(A[..., 2, 2] - l31 * l31 - l32 * l32)
    z = jnp.zeros_like(a11)
    return jnp.stack([jnp.stack([a11, z, z], -1),
                      jnp.stack([l21, a22, z], -1),
                      jnp.stack([l31, l32, a33], -1)], -2)


# ---------------------------------------------------------------------------
# scalarized (component-list) forms
#
# The matrix forms above unpack [N, d, d] arrays by M[..., i, j] slices and
# rebuild dozens of [N, 3, 3] temps; on TPU every such temp is (8, 128)-
# tiled, so both small minor dims pad (3 -> 8 sublanes, 3 -> 128 lanes) and
# each elementwise stage moves ~40x the logical bytes.  Measured r4 at
# N=1e5: the damped-block build + inv6x6 cost ~26 ms of a 109 ms LM step
# (tools/pgo100k_prof.py).  The scalarized forms below take/return plain
# PYTHON LISTS of d*d same-shaped arrays (row-major components) — every
# stage is elementwise on [N]-shaped vectors, which XLA fuses into a
# handful of full-bandwidth passes.  Same trick as lietensor/scalarized.py.
# ---------------------------------------------------------------------------

def inv3x3_scalar(c):
    """Adjugate 3x3 inverse on a row-major component list (len 9)."""
    a, b, c_, d, e, f, g, h, i = c
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c_ * h)
    E = a * i - c_ * g
    F = -(a * h - b * g)
    G = b * f - c_ * e
    H = -(a * f - c_ * d)
    I = a * e - b * d
    det = a * A + b * B + c_ * C
    det = jnp.where(jnp.abs(det) < 1e-36, 1e-36, det)
    inv = 1.0 / det
    return [A * inv, D * inv, G * inv,
            B * inv, E * inv, H * inv,
            C * inv, F * inv, I * inv]


def _mm3_scalar(x, y):
    """Row-major 3x3 component-list product."""
    return [sum(x[i * 3 + k] * y[k * 3 + j] for k in range(3))
            for i in range(3) for j in range(3)]


def inv6x6_scalar(c):
    """6x6 inverse via 3x3-blockwise Schur on a row-major component list
    (len 36) — the scalarized counterpart of :func:`inv6x6`."""
    def blk(ro, co):
        return [c[(ro + i) * 6 + (co + j)] for i in range(3)
                for j in range(3)]

    A, B, C, D = blk(0, 0), blk(0, 3), blk(3, 0), blk(3, 3)
    Ai = inv3x3_scalar(A)
    AiB = _mm3_scalar(Ai, B)
    CAi = _mm3_scalar(C, Ai)
    CAiB = _mm3_scalar(C, AiB)
    S = [D[k] - CAiB[k] for k in range(9)]
    Si = inv3x3_scalar(S)
    AiBSi = _mm3_scalar(AiB, Si)
    TL = [Ai[k] + v for k, v in enumerate(_mm3_scalar(AiBSi, CAi))]
    BL = [-v for v in _mm3_scalar(Si, CAi)]
    out = [None] * 36
    for i in range(3):
        for j in range(3):
            out[i * 6 + j] = TL[i * 3 + j]
            out[i * 6 + j + 3] = -AiBSi[i * 3 + j]
            out[(i + 3) * 6 + j] = BL[i * 3 + j]
            out[(i + 3) * 6 + j + 3] = Si[i * 3 + j]
    return out


def blockinv_scalar(c):
    """Dispatch on component-list length: 9 -> 3x3, 36 -> 6x6."""
    if len(c) == 9:
        return inv3x3_scalar(c)
    if len(c) == 36:
        return inv6x6_scalar(c)
    raise NotImplementedError(f'blockinv_scalar: d*d={len(c)}')
