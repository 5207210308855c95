r"""bf16-operand einsum CG at 100k poses: the byte-reduction experiment.

r4 accounting (tools/pgo100k_prof.py): the einsum CG runs 143 us/iter
effective (matvec 105.8 us vs ~74 us C-read roofline) and CLAUDE.md's
fused-CG negative concluded only BYTE reduction can win further.  The
dominant per-iteration reads are the f32 stencil channels C
[n_off, N, t, t] (28.8 MB, read by BOTH the forward and transposed
contraction), the diagonal blocks D [N, t, t] (14.4 MB) and the
block-Jacobi Binv [N, t, t] (14.4 MB).  This experiment stores all
three in bf16 (CG state x/r/p/z stays f32; contractions accumulate
f32 via preferred_element_type) and measures:

  1. matvec us/call, f32 vs bf16 operands
  2. 250-iter CG wall clock + TRUE f32 residual |b - A x| / |b| at exit
     (the bf16 operator's noise floor is ~1e-3; if the f32 CG is
     iteration-cap-bound above that floor, bf16 is pure win)
  3. optional outer refinement: x1 = x0 + CG_bf16(b - A_f32 x0)
     (the BA bf16-Gram + refinement pattern) when the floor binds

Run:  timeout 1200 python tools/bf16_cg_prof.py   (takes the TPU tunnel)
"""

import functools
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


def warm_time(fn, n_lo=1, n_hi=3, repeats=3):
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


def main():
    print('devices:', jax.devices(), file=sys.stderr)
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import (SparseLM, pgo_factor,
                                         split_chain_edges)
    from pypose_tpu.optim.strategy import TrustRegion
    from pypose_tpu.ops.smallinv import blockinv

    N = 100_000
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
    print(f'N={N} E={edges.shape[0]} factors={len(factors)} spmv={nm}',
          file=sys.stderr)

    @jax.jit
    def formation(params, fdata):
        blocks = [opt._weighted(f, fd, *opt._edge_r_jac(params, f, fd, fi))
                  for fi, (f, fd) in enumerate(zip(opt.factors, fdata))]
        b = opt._rhs(blocks, fdata)
        diag_raw = opt._diag(blocks, fdata)
        accum = opt._block_diag_accum(blocks, fdata)
        states = [sp.precompute(blk[1][nm], blk[3][nm])
                  for sp, blk in zip(opt._spmv, blocks)]
        return b, diag_raw, accum, states

    b, diag_raw, accum, states = jax.block_until_ready(
        formation(params, fdata))
    diagA = {n: jnp.clip(v, opt.min, opt.max) for n, v in diag_raw.items()}
    damping = jnp.asarray(1e-4, jnp.float32)

    def cast_state(st, dt):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, st)

    def make_matvec(D, sts):
        def raw_matvec(x):
            xm = opt._mask(nm, x)
            y = jnp.einsum('ntu,nu->nt', D, xm,
                           precision=_HI if D.dtype == jnp.float32 else None,
                           preferred_element_type=jnp.float32)
            for sp, st in zip(opt._spmv, sts):
                y = y + sp.couple(st, xm)
            return opt._mask(nm, y)
        return raw_matvec

    dcorr = diagA[nm] - diag_raw[nm] + damping * diagA[nm]

    def make_Avp(D, sts):
        mv = make_matvec(D, sts)
        def Avp(x):
            return mv(x) + dcorr * opt._mask(nm, x)
        return Avp

    damped = opt._damped_blocks(accum, {nm: 1.0 + damping})
    Binv_f32 = blockinv(damped[nm])

    variants = {
        'f32': (accum[nm], states, Binv_f32),
        'bf16': (accum[nm].astype(jnp.bfloat16),
                 [cast_state(s, jnp.bfloat16) for s in states],
                 Binv_f32.astype(jnp.bfloat16)),
    }

    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal(b[nm].shape), jnp.float32)

    Avp_exact = make_Avp(accum[nm], states)
    bnorm = float(jnp.linalg.norm(b[nm]))

    results = {}
    for name, (D, sts, Binv) in variants.items():
        mv = make_matvec(D, sts)

        @functools.partial(jax.jit, static_argnames='iters')
        def mv_chain(x, iters, mv=mv):
            def body(i, x):
                y = mv(x)
                s = jax.lax.rsqrt(jnp.sum(y * y) + 1e-30)
                return y * s
            return jax.lax.fori_loop(0, iters, body, x)

        t80 = warm_time(lambda: mv_chain(x0, 80))
        t10 = warm_time(lambda: mv_chain(x0, 10))
        mv_us = (t80 - t10) / 70 * 1e6
        print(f'[{name}] matvec {mv_us:.1f} us/call', file=sys.stderr)

        Avp = make_Avp(D, sts)

        @functools.partial(jax.jit, static_argnames='maxiter')
        def cg(b, x_init, maxiter, Avp=Avp, Binv=Binv):
            pe = jnp.float32

            def M(r):
                return jnp.einsum(
                    'ntu,nu->nt', Binv, r,
                    precision=_HI if Binv.dtype == jnp.float32 else None,
                    preferred_element_type=pe)

            r0 = b - Avp(x_init)
            z0 = M(r0)
            gamma0 = jnp.sum(r0 * z0)
            atol2 = (opt.cg_tol ** 2) * jnp.sum(b * b)

            def cond(st):
                x, r, z, p, gamma, it = st
                return (jnp.sum(r * r) > atol2) & (it < maxiter)

            def body(st):
                x, r, z, p, gamma, it = st
                q = Avp(p)
                alpha = gamma / jnp.sum(p * q)
                x = x + alpha * p
                r = r - alpha * q
                z = M(r)
                g2 = jnp.sum(r * z)
                p = z + (g2 / gamma) * p
                return (x, r, z, p, g2, it + 1)

            st = (x_init, r0, z0, z0, gamma0, jnp.asarray(0, jnp.int32))
            x, r, _, _, _, it = jax.lax.while_loop(cond, body, st)
            return x, it

        zro = jnp.zeros_like(b[nm])
        x250, it250 = jax.block_until_ready(cg(b[nm], zro, 250))
        t250 = warm_time(lambda: cg(b[nm], zro, 250))
        t25 = warm_time(lambda: cg(b[nm], zro, 25))
        it = int(jax.device_get(it250))
        true_res = float(jnp.linalg.norm(b[nm] - Avp_exact(x250))) / bnorm
        per = (t250 - t25) / 225 * 1e6 if it >= 250 else float('nan')
        print(f'[{name}] cg250: {t250*1e3:.2f} ms, it={it}, '
              f'true |b-Ax|/|b| = {true_res:.3e}, '
              f'{per:.1f} us/iter marginal', file=sys.stderr)
        results[name] = dict(mv_us=mv_us, t250=t250, it=it,
                             res=true_res, cg=cg)

    # outer refinement: one bf16 CG pass, f32 residual, second bf16 pass
    cgb = results['bf16']['cg']
    zro = jnp.zeros_like(b[nm])

    @jax.jit
    def refine2(b):
        x1, _ = cgb(b, jnp.zeros_like(b), 125)
        r1 = b - Avp_exact(x1)
        d, _ = cgb(r1, jnp.zeros_like(b), 125)
        return x1 + d

    xr = jax.block_until_ready(refine2(b[nm]))
    tr = warm_time(lambda: refine2(b[nm]))
    rr = float(jnp.linalg.norm(b[nm] - Avp_exact(xr))) / bnorm
    print(f'[bf16+refine] 2x125-iter passes: {tr*1e3:.2f} ms, '
          f'true res {rr:.3e}', file=sys.stderr)

    f, bfr = results['f32'], results['bf16']
    print(f'SUMMARY matvec {f["mv_us"]:.1f} -> {bfr["mv_us"]:.1f} us; '
          f'cg250 {f["t250"]*1e3:.1f} -> {bfr["t250"]*1e3:.1f} ms; '
          f'res {f["res"]:.2e} vs {bfr["res"]:.2e} '
          f'(refine {rr:.2e} @ {tr*1e3:.1f} ms)')


if __name__ == '__main__':
    main()
