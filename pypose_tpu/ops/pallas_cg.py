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


def _tiled_mv_kernel(A_ref, C_ref, p_ref, pf_ref, q_ref, bk_ref, *,
                     n_off, t):
    """One node-tile of the stencil matvec, channels read ONCE.

    q_partial = A p + sum_k C_k p_{+d_k}        (forward, local)
    bk_k      = C_k^T p                          (back-product at source;
                                                  caller rolls it by +d_k)
    """
    p = p_ref[:]
    q = _block_mul(A_ref[:], p, t)
    tt = t * t
    for k in range(n_off):
        Ck = C_ref[k * tt:(k + 1) * tt, :]
        q = q + _block_mul(Ck, pf_ref[k * t:(k + 1) * t, :], t)
        bk_ref[k * t:(k + 1) * t, :] = _block_mul(Ck, p, t, transpose=True)
    q_ref[:] = q


def _tiled_pc_kernel(Minv_ref, r_ref, z_ref, *, t):
    z_ref[:] = _block_mul(Minv_ref[:], r_ref[:], t)


def stencil_cg_tiled(b_T, A_T, Minv_T, C_T, offsets, t, maxiter, tol,
                     tile=8192, interpret=False):
    """PCG with HBM-streamed operands: per-iteration Pallas kernels tile
    the [t, N] lane-major matvec and preconditioner through VMEM while
    the CG state stays in fused XLA elementwise ops.

    The whole-CG kernel (stencil_cg_transposed) needs all operands
    VMEM-resident (~10 MB); past that this path streams A/Minv/C tiles
    per iteration instead — the iteration floor is the channel-read
    roofline.  Channels are read ONCE per matvec: the kernel emits the
    forward partial plus per-offset back-products bk_k = C_k^T p, and
    XLA deposits roll(bk_k, +d_k).  Rolls wrap at the unpadded node
    count N; everything past it is zero-padded so padded lanes stay
    exactly zero through the whole solve.

    Args are the transposed operands of stencil_cg_transposed; returns
    (x_T [t, N], iterations).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = int(t)
    tt = t * t
    n_off = len(offsets)
    N = b_T.shape[1]
    pad = (-N) % tile
    Npad = N + pad
    T = Npad // tile

    def padN(a):
        return jnp.pad(a, ((0, 0), (0, Npad - a.shape[1])))

    b_p, A_p, Minv_p, C_p = (padN(a) for a in (b_T, A_T, Minv_T, C_T))

    mv = pl.pallas_call(
        functools.partial(_tiled_mv_kernel, n_off=n_off, t=t),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((tt, tile), lambda j: (0, j)),
            pl.BlockSpec((n_off * tt, tile), lambda j: (0, j)),
            pl.BlockSpec((t, tile), lambda j: (0, j)),
            pl.BlockSpec((n_off * t, tile), lambda j: (0, j)),
        ],
        out_specs=(pl.BlockSpec((t, tile), lambda j: (0, j)),
                   pl.BlockSpec((n_off * t, tile), lambda j: (0, j))),
        out_shape=(jax.ShapeDtypeStruct((t, Npad), b_T.dtype),
                   jax.ShapeDtypeStruct((n_off * t, Npad), b_T.dtype)),
        interpret=interpret,
    )

    pc = pl.pallas_call(
        functools.partial(_tiled_pc_kernel, t=t),
        grid=(T,),
        in_specs=[pl.BlockSpec((tt, tile), lambda j: (0, j)),
                  pl.BlockSpec((t, tile), lambda j: (0, j))],
        out_specs=pl.BlockSpec((t, tile), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((t, Npad), b_T.dtype),
        interpret=interpret,
    )

    def roll_n(v, d):
        """Circular roll along lanes wrapping at N (not Npad)."""
        core = jnp.roll(v[:, :N], d, axis=1)
        return jnp.pad(core, ((0, 0), (0, Npad - N)))

    def matvec(p):
        pf = jnp.concatenate([roll_n(p, -d) for d in offsets], axis=0)
        q, bk = mv(A_p, C_p, p, pf)
        for k, d in enumerate(offsets):
            q = q + roll_n(bk[k * t:(k + 1) * t, :], d)
        return q

    x0 = jnp.zeros_like(b_p)
    r0 = b_p
    z0 = pc(Minv_p, r0)
    gamma0 = jnp.sum(r0 * z0)
    tol2 = (tol * tol) * jnp.sum(b_p * b_p)

    def cond(st):
        x, r, z, p, gamma, it = st
        return (it < maxiter) & (jnp.sum(r * r) > tol2)

    def body(st):
        x, r, z, p, gamma, it = st
        Ap = matvec(p)
        denom = jnp.sum(p * Ap)
        alpha = gamma / jnp.where(denom == 0, 1e-31, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = pc(Minv_p, r)
        gamma_new = jnp.sum(r * z)
        beta = gamma_new / jnp.where(gamma == 0, 1e-31, gamma)
        p = z + beta * p
        return (x, r, z, p, gamma_new, it + 1)

    st = (x0, r0, z0, z0, gamma0, jnp.asarray(0, jnp.int32))
    x, r, _, _, _, it = jax.lax.while_loop(cond, body, st)
    return x[:, :N], it


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
    # VMEM budget gate: the whole-CG kernel keeps operands (b, A, Minv,
    # C) plus ~5 CG state vectors and matvec temporaries resident in
    # VMEM (scoped VMEM is 16 MB on v5e; past ~10 MB the compile fails
    # "scoped vmem limit exceeded").  Oversize problems stream operand
    # tiles per iteration instead (stencil_cg_tiled).  With Pallas
    # unavailable the XLA fallback of the same algorithm runs — note its
    # [t, N] _block_mul does not fuse (283 us/iter at N=1e5, CLAUDE.md);
    # callers off-TPU should prefer their own [N, t] einsum CG.
    tiled = use_pallas and not stencil_cg_fits_vmem(N, t, n_off)
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
    if tiled:
        x_T, it = stencil_cg_tiled(b_T, A_T, Minv_T, C_T,
                                   tuple(int(d) for d in offsets), t,
                                   int(maxiter), float(tol))
    else:
        x_T, it = stencil_cg_transposed(b_T, A_T, Minv_T, C_T,
                                        tuple(int(d) for d in offsets), t,
                                        int(maxiter), float(tol),
                                        use_pallas=use_pallas)
    return x_T.T, it
