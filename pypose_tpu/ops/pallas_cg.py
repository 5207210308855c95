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


def _fused_axpy_kernel(sc_ref, u_ref, p_ref, s_ref, w_ref, x_ref, r_ref,
                       Minv_ref, p2_ref, s2_ref, x2_ref, r2_ref, u2_ref,
                       dots_ref, *, t):
    """Pass 1 of the fused CG-CG iteration (one node tile).

    Given scalars (alpha, beta) all vector updates of the
    Chronopoulos-Gear recursion are local:

        p' = u + beta p        s' = w + beta s   (s tracks A p)
        x' = x + alpha p'      r' = r - alpha s'
        u' = Minv r'           gamma' = (r', u')   rr' = (r', r')

    Dot partials accumulate across the sequential TPU grid into an SMEM
    output block that stays resident (constant index_map)."""
    from jax.experimental import pallas as pl

    alpha = sc_ref[0]
    beta = sc_ref[1]
    p2 = u_ref[:] + beta * p_ref[:]
    s2 = w_ref[:] + beta * s_ref[:]
    x2_ref[:] = x_ref[:] + alpha * p2
    r2 = r_ref[:] - alpha * s2
    u2 = _block_mul(Minv_ref[:].astype(jnp.float32), r2, t)
    p2_ref[:] = p2
    s2_ref[:] = s2
    r2_ref[:] = r2
    u2_ref[:] = u2

    @pl.when(pl.program_id(0) == 0)
    def _():
        dots_ref[0] = 0.0
        dots_ref[1] = 0.0

    dots_ref[0] += jnp.sum(r2 * u2)
    dots_ref[1] += jnp.sum(r2 * r2)


def _fused_mv_kernel(A_ref, C_ref, u_ref, pf_ref, q_ref, bk_ref,
                     dots_ref, *, n_off, t):
    """Pass 2 of the fused CG-CG iteration: stencil matvec partials.

        q    = A u + sum_k C_k pf_k          (pf_k = roll(u, -d_k))
        bk_k = C_k^T u                        (caller deposits roll(+d_k))
        delta = (w, u) = (q, u) + sum_k (bk_k, pf_k)

    The delta identity uses sum(roll(bk, +d) * u) == sum(bk * roll(u, -d)),
    so the dot is complete before the back-deposit is materialized."""
    from jax.experimental import pallas as pl

    u = u_ref[:]
    A = A_ref[:].astype(jnp.float32)
    q = _block_mul(A, u, t)
    tt = t * t
    dot = jnp.float32(0.0)
    for k in range(n_off):
        Ck = C_ref[k * tt:(k + 1) * tt, :].astype(jnp.float32)
        pfk = pf_ref[k * t:(k + 1) * t, :]
        q = q + _block_mul(Ck, pfk, t)
        bk = _block_mul(Ck, u, t, transpose=True)
        bk_ref[k * t:(k + 1) * t, :] = bk
        dot = dot + jnp.sum(bk * pfk)
    q_ref[:] = q
    dot = dot + jnp.sum(q * u)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dots_ref[0] = 0.0

    dots_ref[0] += dot


def stencil_cg_fused(b_T, A_T, Minv_T, C_T, offsets, t, maxiter, tol,
                     tile=8192, interpret=False, operand_dtype=None):
    """HBM-streamed PCG with the whole iteration fused into TWO Pallas
    passes (Chronopoulos-Gear recursion).

    The r3 tiled attempt (stencil_cg_tiled) lost to the einsum CG
    because splitting the iteration into mv + pc kernels + ~6 XLA
    axpy/roll fusions re-read the state vectors many times and paid
    per-kernel dispatch.  CG-CG reorders the recursion so both dot
    products land together right after the matvec; every axpy, the
    block-Jacobi apply, and both dots then fuse into pass 1, and the
    matvec plus its dot into pass 2.  Only the lane rolls (the
    circulant shifts, which cross tile boundaries) stay in XLA glue.
    Dots are accumulated in SMEM across the sequential grid — no
    [T]-partial buffers, no extra reduction kernels.

    ``operand_dtype=jnp.bfloat16`` stores A/Minv/C in bf16 (halving the
    dominant operand re-read traffic) while all arithmetic stays f32 on
    the VPU; the preconditioner is exact-agnostic and the bf16 system
    perturbation is absorbed by the LM damping loop.

    Args as stencil_cg_transposed; returns (x_T [t, N], iterations).
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

    b_p = padN(b_T)
    A_p, Minv_p, C_p = (padN(a) for a in (A_T, Minv_T, C_T))
    if operand_dtype is not None:
        A_p = A_p.astype(operand_dtype)
        Minv_p = Minv_p.astype(operand_dtype)
        C_p = C_p.astype(operand_dtype)

    vec = lambda r: pl.BlockSpec((r, tile), lambda j: (0, j))  # noqa: E731
    smem = lambda n: pl.BlockSpec(  # noqa: E731
        (n,), lambda j: (0,), memory_space=pltpu.SMEM)

    axpy = pl.pallas_call(
        functools.partial(_fused_axpy_kernel, t=t),
        grid=(T,),
        in_specs=[smem(2), vec(t), vec(t), vec(t), vec(t), vec(t), vec(t),
                  vec(tt)],
        out_specs=(vec(t), vec(t), vec(t), vec(t), vec(t), smem(2)),
        out_shape=(jax.ShapeDtypeStruct((t, Npad), jnp.float32),) * 5
        + (jax.ShapeDtypeStruct((2,), jnp.float32),),
        interpret=interpret,
    )

    mv = pl.pallas_call(
        functools.partial(_fused_mv_kernel, n_off=n_off, t=t),
        grid=(T,),
        in_specs=[vec(tt), vec(n_off * tt), vec(t), vec(n_off * t)],
        out_specs=(vec(t), vec(n_off * t), smem(1)),
        out_shape=(jax.ShapeDtypeStruct((t, Npad), jnp.float32),
                   jax.ShapeDtypeStruct((n_off * t, Npad), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.float32)),
        interpret=interpret,
    )

    def roll_n(v, d):
        """Circular roll along lanes wrapping at N (not Npad); padded
        lanes stay exactly zero."""
        core = jnp.roll(v[:, :N], d, axis=1)
        return jnp.pad(core, ((0, 0), (0, Npad - N)))

    def matvec(u):
        pf = jnp.concatenate([roll_n(u, -d) for d in offsets], axis=0)
        q, bk, delta = mv(A_p, C_p, u, pf)
        w = q
        for k, d in enumerate(offsets):
            w = w + roll_n(bk[k * t:(k + 1) * t, :], d)
        return w, delta[0]

    # init: one pass-1 call with alpha=beta=0 and zero (u, p, s, w)
    # degenerates to  x0=0, r0=b, u0=Minv b, gamma0=(r0,u0), rr0=(b,b)
    zv = jnp.zeros_like(b_p)
    sc0 = jnp.zeros((2,), jnp.float32)
    _, _, x0, r0, u0, d0 = axpy(sc0, zv, zv, zv, zv, zv, b_p, Minv_p)
    gamma0, rr0 = d0[0], d0[1]
    w0, delta0 = matvec(u0)
    tol2 = (tol * tol) * rr0

    def cond(st):
        (x, r, p, s, u, w, gamma, delta, gamma_pr, alpha_pr, rr, it) = st
        return (it < maxiter) & (rr > tol2)

    def body(st):
        (x, r, p, s, u, w, gamma, delta, gamma_pr, alpha_pr, rr, it) = st
        first = it == 0
        beta = jnp.where(first, 0.0, gamma / jnp.where(gamma_pr == 0,
                                                       1e-31, gamma_pr))
        den = delta - beta * gamma / jnp.where(alpha_pr == 0, 1e-31,
                                               alpha_pr)
        alpha = gamma / jnp.where(
            first, jnp.where(delta == 0, 1e-31, delta),
            jnp.where(den == 0, 1e-31, den))
        sc = jnp.stack([alpha, beta])
        p2, s2, x2, r2, u2, d2 = axpy(sc, u, p, s, w, x, r, Minv_p)
        gamma2, rr2 = d2[0], d2[1]
        w2, delta2 = matvec(u2)
        return (x2, r2, p2, s2, u2, w2, gamma2, delta2, gamma, alpha,
                rr2, it + 1)

    one = jnp.float32(1.0)
    st = (x0, r0, zv, zv, u0, w0, gamma0, delta0, one, one, rr0,
          jnp.asarray(0, jnp.int32))
    out = jax.lax.while_loop(cond, body, st)
    x = out[0]
    it = out[-1]
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
