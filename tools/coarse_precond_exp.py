r"""Two-level (Galerkin coarse-grid) preconditioner experiment on the
100k-pose PGO normal equations — VERDICT r4 directive #2(c).

The r4 circulant negative ruled out *constant-coefficient* surrogates
(tools/circulant_precond_exp.py: mean rotations cancel over the sphere);
a Galerkin coarse grid keeps the actual coefficients: aggregate g
consecutive poses (piecewise-constant prolongation P, the natural
choice on a near-circulant odometry chain), form A_c = P^T A P exactly
from the stencil channels, invert it densely ONCE per damping, and
precondition with the ADDITIVE two-level operator

    M x = BlockJacobi(x) + mask(P A_c^{-1} P^T mask(x))

MEASURED NEGATIVE (r5, real chip, N=1e5/E=1.8e5/damping=1e-4, this
tool; Galerkin construction verified == P^T A P to f32 roundoff at
N=200):

    bj                 tol 1e-3:  30 iters   tol 1e-6: 464 (79 ms)
    add  g=250/1000    tol 1e-3: 38/37       tol 1e-6: 551/545
    mult g=250/1000    tol 1e-3: 30/30       tol 1e-6: 456/460

The symmetric multiplicative V-cycle — with the EXACT coarse operator
solved exactly — buys at most 2% fewer iterations while paying 2 extra
fine matvecs per apply; the additive form is actively worse (the
coarse correction double-counts with BJ in the coarse space).  N=2000
CPU shows the same shape (438 -> 382 best case).  The conclusion is
structural, not a tuning miss: in the LEFT-trivialized tangent
convention a CONSTANT coarse vector x is exactly a rigid move of the
whole segment (T_i <- Exp(x) T_i), i.e. piecewise-constant aggregation
IS the textbook near-null-space prolongation for PGO — and it still
captures almost none of the BJ-limiting error.  What limits
block-Jacobi here is per-edge Jl_inv(r)-dependent weight variation
(local roughness), the same mechanism behind the r4 circulant-surrogate
negative (tools/circulant_precond_exp.py).  Two-level/multigrid
preconditioning of these normal equations is closed as a direction;
block-Jacobi + the einsum CG remains the endpoint.

Run:  timeout 1500 python tools/coarse_precond_exp.py          (TPU)
      PPT_EXP_N=2000 python tools/coarse_precond_exp.py        (CPU smoke)
"""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

_HI = jax.lax.Precision.HIGHEST


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def warm_time(fn, n_lo=2, n_hi=12, repeats=3):
    sync(fn())
    def block(n):
        best = float('inf')
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best
    return max(block(n_hi) - block(n_lo), 1e-12) / (n_hi - n_lo)


def counting_pcg(A, M, b, tol, maxiter):
    """Hand-rolled PCG that reports the iteration count reaching
    |r| <= tol * |b| (jax.scipy's cg hides it)."""
    bnorm = jnp.sqrt(jnp.sum(b * b))
    atol2 = (tol * bnorm) ** 2

    def cond(st):
        x, r, z, p, rz, k = st
        return (jnp.sum(r * r) > atol2) & (k < maxiter)

    def body(st):
        x, r, z, p, rz, k = st
        Ap = A(p)
        alpha = rz / jnp.sum(p * Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.sum(r * z)
        p = z + (rz_new / rz) * p
        return x, r, z, p, rz_new, k + 1

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = M(r0)
    st = (x0, r0, z0, z0, jnp.sum(r0 * z0), jnp.int32(0))
    x, r, _, _, _, k = jax.lax.while_loop(cond, body, st)
    rel = jnp.sqrt(jnp.sum(r * r)) / bnorm
    return x, k, rel


def main():
    print('devices:', jax.devices(), file=sys.stderr)
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import (SparseLM, pgo_factor,
                                         split_chain_edges)
    from pypose_tpu.optim.strategy import TrustRegion

    N = int(os.environ.get('PPT_EXP_N', 100_000))
    ds = synthetic_sphere(N)
    edges = jnp.asarray(ds['edges'])
    runs, rest = split_chain_edges(edges)
    factors = [pgo_factor(edges[jnp.asarray(r)],
                          ds['poses'][jnp.asarray(r)]) for r in runs]
    if len(rest):
        factors.append(pgo_factor(edges[jnp.asarray(rest)],
                                  ds['poses'][jnp.asarray(rest)]))
    fixed = {'poses': jnp.zeros(N, bool).at[0].set(True)}
    opt = SparseLM({'poses': ds['nodes']}, factors,
                   strategy=TrustRegion(radius=1e4), fixed=fixed,
                   cg_iter=250, cg_tol=1e-6)
    params = opt.params
    fdata = opt._factor_data()
    nm = opt._spmv_name
    offsets = opt._stencil_all.offsets
    t = 6
    print(f'N={N} E={edges.shape[0]} offsets={offsets}', file=sys.stderr)

    @jax.jit
    def formation(params, fdata):
        blocks = [opt._weighted(f, fd, *opt._edge_r_jac(params, f, fd, fi))
                  for fi, (f, fd) in enumerate(zip(opt.factors, fdata))]
        b = opt._rhs(blocks, fdata)
        diag_raw = opt._diag(blocks, fdata)
        accum = opt._block_diag_accum(blocks, fdata)
        C_all = opt._stencil_all.precompute_multi(
            [(blk[1][nm], blk[3][nm]) for blk in blocks])
        return b[nm], diag_raw[nm], accum[nm], C_all

    b, diag_raw, D_spmv, C_all = jax.device_get(formation(params, fdata))
    b = jnp.asarray(b)
    diag_raw = jnp.asarray(diag_raw)
    D_spmv = jnp.asarray(D_spmv)
    C_all = jnp.asarray(C_all)
    diagA = jnp.clip(diag_raw, opt.min, opt.max)
    mask = ~np.asarray(fixed['poses'])
    maskv = jnp.asarray(mask[:, None].astype(np.float32))

    sp = opt._stencil_all

    def make_A(damping):
        corr = diagA - diag_raw + damping * diagA   # [N, t]

        def A(x):
            xm = x * maskv
            y = jnp.einsum('ntu,nu->nt', D_spmv, xm, precision=_HI)
            y = y + sp.couple(C_all, xm)
            y = y + corr * xm
            return y * maskv
        return A, corr

    # block-Jacobi blocks at a given damping (same as SparseLM)
    def bj_inv(damping):
        scale = 1.0 + damping
        blocksD = D_spmv.at[:, jnp.arange(t), jnp.arange(t)].set(
            jnp.clip(D_spmv[:, jnp.arange(t), jnp.arange(t)],
                     opt.min, opt.max) * scale + 1e-8)
        return jnp.linalg.inv(blocksD)

    # ---- coarse-grid construction (static slot maps, host side) -------
    def coarse_slots(g):
        Nc = N // g
        assert Nc * g == N, f'g={g} must divide N={N}'
        i = np.arange(N)
        I = i // g
        slot_diag = I * Nc + I
        slots = []
        for d in offsets:
            J = ((i + d) % N) // g
            slots.append(I * Nc + J)
        return Nc, jnp.asarray(slot_diag), [jnp.asarray(s) for s in slots]

    def build_coarse(g, damping, corr):
        Nc, slot_diag, slots = coarse_slots(g)
        # full fine diagonal blocks incl. clamped+damped correction,
        # with fixed nodes dropped (mask zeroes the whole block)
        Dfull = D_spmv.at[:, jnp.arange(t), jnp.arange(t)].add(corr)
        Dfull = Dfull * maskv[:, :1, None]
        flatD = Dfull.reshape(N, t * t)
        Ac = jax.ops.segment_sum(flatD, slot_diag, num_segments=Nc * Nc)
        for k, d in enumerate(offsets):
            m_src = maskv[:, 0]
            m_dst = jnp.roll(maskv[:, 0], -d)
            Cd = (C_all[k] * (m_src * m_dst)[:, None, None]).reshape(
                N, t * t)
            Ac = Ac + jax.ops.segment_sum(Cd, slots[k],
                                          num_segments=Nc * Nc)
            # transpose contribution: block (J, I) += C_d[i]^T
            CdT = jnp.transpose(
                C_all[k] * (m_src * m_dst)[:, None, None],
                (0, 2, 1)).reshape(N, t * t)
            i_idx = np.arange(N)
            slotT = jnp.asarray((((i_idx + np.array(d)) % N) // g) * Nc
                                + (i_idx // g))
            Ac = Ac + jax.ops.segment_sum(CdT, slotT,
                                          num_segments=Nc * Nc)
        Ac = Ac.reshape(Nc, Nc, t, t).transpose(0, 2, 1, 3).reshape(
            Nc * t, Nc * t)
        # tiny Tikhonov for aggregates that became empty under the mask
        Ac = Ac + 1e-6 * jnp.eye(Nc * t)
        return Nc, jnp.linalg.inv(Ac)

    def make_M_two_level(g, damping, corr, Binv, A):
        """Returns (additive, multiplicative) two-level preconditioners.

        additive:        M r = BJ r + Pc r
        multiplicative:  M r = z2 + Pc (r - A z2),
                         z2 = z1 + BJ (r - A z1), z1 = Pc r
        (symmetric coarse-smooth-coarse V-cycle; costs 2 extra fine
        matvecs per apply).  Pc = P A_c^{-1} P^T with piecewise-constant
        P — which, in the LEFT-trivialized tangent convention, exactly
        spans segment-rigid motions (T_i <- Exp(x) T_i with constant x
        is a rigid move of the whole segment), i.e. the textbook
        near-null-space prolongation for this problem."""
        Nc, Ainv_c = build_coarse(g, damping, corr)

        def Pc(r):
            rc = (r * maskv).reshape(Nc, g, t).sum(1).reshape(Nc * t)
            zc = (Ainv_c @ rc).reshape(Nc, t)
            return jnp.repeat(zc, g, axis=0) * maskv

        def BJ(r):
            return jnp.einsum('ntu,nu->nt', Binv, r,
                              precision=_HI) * maskv

        def M_add(r):
            return BJ(r) + Pc(r)

        def M_mult(r):
            z1 = Pc(r)
            z2 = z1 + BJ(r - A(z1))
            return z2 + Pc(r - A(z2))
        return M_add, M_mult

    # ---- experiment ----------------------------------------------------
    damping = 1e-4   # TrustRegion(radius=1e4) => 1/radius
    A, corr = make_A(damping)
    Binv = bj_inv(damping)

    def M_bj(r):
        return jnp.einsum('ntu,nu->nt', Binv, r, precision=_HI) * maskv

    run = jax.jit(functools.partial(counting_pcg, maxiter=1500),
                  static_argnums=(0, 1))

    for tol in (1e-3, 1e-6):
        x, k, rel = run(A, M_bj, b, tol)
        sync(x)
        tm = warm_time(lambda: run(A, M_bj, b, tol), n_lo=1, n_hi=3)
        print(f'[bj]      tol={tol:g}: iters={int(k)} rel={float(rel):.2e}'
              f' solve={tm*1e3:.1f} ms', file=sys.stderr)

    # each (g, variant) pair recompiles the whole-CG while_loop (remote
    # compiles run 40-240 s): keep the TPU ladder short
    gs = (250, 1000) if jax.default_backend() == 'tpu' \
        else (100, 250, 500, 1000)
    for g in gs:
        if N % g:
            continue
        M_add, M_mult = make_M_two_level(g, damping, corr, Binv, A)
        for label, M2 in (('add ', M_add), ('mult', M_mult)):
            for tol in (1e-3, 1e-6):
                x, k, rel = run(A, M2, b, tol)
                sync(x)
                tm = warm_time(lambda: run(A, M2, b, tol), n_lo=1, n_hi=3)
                print(f'[2lvl-{label} g={g:4d}] tol={tol:g}: '
                      f'iters={int(k)} rel={float(rel):.2e} '
                      f'solve={tm*1e3:.1f} ms', file=sys.stderr)
    print('OK')


if __name__ == '__main__':
    main()
