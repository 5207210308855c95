r"""Whole-CG Pallas kernel for stencil-form normal equations.

The XLA CG loop (jax.scipy.sparse.linalg.cg around the stencil matvec,
ops/spmv.py) re-reads every operand from HBM and pays multi-kernel
dispatch on every iteration.  This kernel keeps the ENTIRE solver state
in VMEM — x, r, p, z vectors ([t, N] transposed layout: lane = node),
the damped diagonal blocks, the block-Jacobi preconditioner, and the
circulant coupling channels (~2.2 MB total for sphere2500) — and runs all
CG iterations in ONE kernel launch: per-iteration cost is pure VPU
(batched 6x6 block products + lane rotations), no HBM traffic, no
dispatch.

Matvec (see ops/spmv.py StencilSpMV):

    A x = Ablk x + sum_k [ C_k . roll(x, -d_k) + roll(C_k^T . x, +d_k) ]

Layouts (all f32):
    vectors   [t, N]        (t sublanes, node lanes)
    blocks    [t*t, N]      (row-major block entry (i, u) at sublane i*t+u)
    channels  [n_off*t*t, N]

The caller folds gauge fixing into the operands (identity diagonal blocks
and zeroed channels at fixed nodes) — the kernel sees an unconstrained
SPD system.  Falls back to a pure-XLA implementation of the identical
algorithm when Pallas is unavailable (also used in interpret tests).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _block_mul(M_T, v, t, transpose=False):
    """[t*t, N] block-diagonal times [t, N]: y_i = sum_u M[i,u] * v_u."""
    rows = []
    for i in range(t):
        acc = None
        for u in range(t):
            r_ = (u * t + i) if transpose else (i * t + u)
            term = M_T[r_:r_ + 1, :] * v[u:u + 1, :]
            acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.concatenate(rows, axis=0)


def _roll_lanes(v, d):
    """Circular roll LEFT by d along the lane (node) axis; d static
    (negative d rolls right)."""
    d = int(d) % v.shape[1]
    if d == 0:
        return v
    return jnp.concatenate([v[:, d:], v[:, :d]], axis=1)


def _stencil_matvec(A_T, C_T, offsets, t, p):
    y = _block_mul(A_T, p, t)
    tt = t * t
    for k, d in enumerate(offsets):
        Ck = C_T[k * tt:(k + 1) * tt, :]
        pr = _roll_lanes(p, d)                       # x_{n+d}
        y = y + _block_mul(Ck, pr, t)
        back = _block_mul(Ck, p, t, transpose=True)  # C^T x at source n
        y = y + _roll_lanes(back, -d)                # deposit at n+d
    return y


def _cg_body(A_T, Minv_T, C_T, b, offsets, t, maxiter, tol):
    """The CG algorithm itself (shared by kernel and XLA fallback)."""
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = _block_mul(Minv_T, r0, t)
    gamma0 = jnp.sum(r0 * z0)
    bnorm2 = jnp.sum(b * b)
    tol2 = (tol * tol) * bnorm2

    def cond(st):
        x, r, z, p, gamma, it = st
        return (it < maxiter) & (jnp.sum(r * r) > tol2)

    def body(st):
        x, r, z, p, gamma, it = st
        Ap = _stencil_matvec(A_T, C_T, offsets, t, p)
        denom = jnp.sum(p * Ap)
        alpha = gamma / jnp.where(denom == 0, 1e-31, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = _block_mul(Minv_T, r, t)
        gamma_new = jnp.sum(r * z)
        beta = gamma_new / jnp.where(gamma == 0, 1e-31, gamma)
        p = z + beta * p
        return (x, r, z, p, gamma_new, it + 1)

    st = (x0, r0, z0, b * 0 + z0, gamma0, jnp.asarray(0, jnp.int32))
    x, r, _, _, _, it = jax.lax.while_loop(cond, body, st)
    return x, it


def _kernel(b_ref, A_ref, Minv_ref, C_ref, x_ref, it_ref, *, offsets, t,
            maxiter, tol):
    x, it = _cg_body(A_ref[:], Minv_ref[:], C_ref[:], b_ref[:],
                     offsets, t, maxiter, tol)
    x_ref[:] = x
    it_ref[0] = it


@functools.partial(jax.jit, static_argnames=('offsets', 't', 'maxiter',
                                             'tol', 'use_pallas'))
def stencil_cg_transposed(b_T, A_T, Minv_T, C_T, offsets, t, maxiter,
                          tol, use_pallas=True):
    """Solve A x = b in transposed layout.  Returns (x_T, iterations)."""
    if not use_pallas:
        return _cg_body(A_T, Minv_T, C_T, b_T, offsets, t, maxiter, tol)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    kern = functools.partial(_kernel, offsets=offsets, t=t,
                             maxiter=maxiter, tol=tol)
    x, it = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(b_T.shape, b_T.dtype),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
    )(b_T, A_T, Minv_T, C_T)
    return x, it[0]


def stencil_cg_fits_vmem(N, t, n_off):
    """True when the whole-CG kernel's VMEM footprint fits the ~10 MB
    budget (operands b/A/Minv/C + ~5 state vectors + matvec temps).
    Callers should take their OWN [N, t]-layout CG path when this is
    False: the kernel's [t, N] transposed XLA fallback was measured at
    283 us/iter + 38 ms fixed at N=100k (the t*t-slice _block_mul does
    not fuse outside Pallas) vs ~30 us for the plain einsum matvec."""
    est_bytes = 4 * N * (t + 2 * t * t + n_off * t * t + 5 * t + 2 * t)
    return est_bytes <= 10 * 2 ** 20


def stencil_cg(b, Ablk, dcorr, Minv, C, offsets, fixed_mask=None,
               maxiter=100, tol=1e-5, use_pallas=True):
    r"""Preconditioned CG on stencil-form normal equations.

    Args:
        b: [N, t] right-hand side.
        Ablk: [N, t, t] UNDAMPED diagonal blocks of J^T W J.
        dcorr: [N, t] per-coordinate diagonal correction (the LM
            clamp/damp term ``diagA - diag_raw + damping * diagA``).
        Minv: [N, t, t] block-Jacobi preconditioner (inverted damped
            blocks).
        C: [n_off, N, t, t] coupling channels (StencilSpMV.precompute).
        offsets: static tuple of circular offsets.
        fixed_mask: optional bool [N]; fixed nodes are pinned to zero.
    Returns (x [N, t], iterations).
    """
    N, t = b.shape
    n_off = C.shape[0]
    # VMEM budget gate: the kernel keeps operands (b, A, Minv, C) plus
    # ~5 CG state vectors and matvec temporaries resident in VMEM.
    # Scoped VMEM is 16 MB on v5e; past ~10 MB estimated footprint the
    # compile fails ("scoped vmem limit exceeded"), so fall back to the
    # same CG in plain XLA (HBM-resident, still stencil-form matvec).
    # NOTE: prefer checking stencil_cg_fits_vmem() and routing to an
    # [N, t]-layout CG instead — the transposed fallback is ~9x slower
    # per iteration at N=100k (SparseLM does this, optim/sparse.py).
    if not stencil_cg_fits_vmem(N, t, n_off):
        use_pallas = False
    if fixed_mask is not None:
        m = (~jnp.asarray(fixed_mask)).astype(b.dtype)
        b = b * m[:, None]
        dcorr = dcorr * m[:, None]
        eye = jnp.eye(t, dtype=b.dtype)
        Ablk = jnp.where(m[:, None, None] > 0, Ablk, eye)
        Minv = jnp.where(m[:, None, None] > 0, Minv, eye)
        cm = []
        for k, d in enumerate(offsets):
            mk = m * jnp.roll(m, -d)
            cm.append(C[k] * mk[:, None, None])
        C = jnp.stack(cm)
    # fold the diagonal correction into the blocks
    eye = jnp.eye(t, dtype=b.dtype)
    Ablk = Ablk + dcorr[..., None] * eye
    # transpose to lane-major layouts
    b_T = b.T                                             # [t, N]
    A_T = jnp.transpose(Ablk, (1, 2, 0)).reshape(t * t, N)
    Minv_T = jnp.transpose(Minv, (1, 2, 0)).reshape(t * t, N)
    C_T = jnp.transpose(C, (0, 2, 3, 1)).reshape(n_off * t * t, N)
    x_T, it = stencil_cg_transposed(b_T, A_T, Minv_T, C_T,
                                    tuple(int(d) for d in offsets), t,
                                    int(maxiter), float(tol),
                                    use_pallas=use_pallas)
    return x_T.T, it
