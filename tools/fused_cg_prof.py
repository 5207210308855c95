r"""Head-to-head on the real TPU at 100k poses: SparseLM's einsum-CG
(the oversize-path default) vs the fused two-pass Chronopoulos-Gear
Pallas CG (ops/pallas_cg.py:stencil_cg_fused), f32 and bf16 operands.

Per-iteration cost is isolated by differencing two maxiter values with
tol=0 (no early exit).  Run:

    timeout 900 python tools/fused_cg_prof.py    (takes the TPU tunnel)

Measured 2026-08-18 (r4, one v5e) — NEGATIVE RESULT, kernel not routed:
    einsum-cg      ~119 us/iter (it=92 exit corrected)
    tiled (r3)     198-250 us/iter     <- the r3 recorded negative
    fused f32      165-200 us/iter     <- LOSES to the einsum CG
    fused bf16     NaN on hardware (interpret-mode correct; the two-pass
                   recurrence amplifies bf16 rounding in the
                   Chronopoulos-Gear coupled scalars until divergence)
Why the einsum CG stands: per-iteration glue traffic is ~105 MB
(C blocks + x/r/p/s state at N=1e5/t=6/n_off=2), i.e. ~128 us at the
v5e's ~820 GB/s — the einsum CG's measured 119-129 us/iter is already
at that roofline, so a fused kernel can only win by shrinking BYTES
(operand dtype or stencil compression), not by fusing launches.  The
~74 us "C-read roofline" in CLAUDE.md counts only the C blocks; the
state vectors' traffic is irreducible in any one-pass-per-iteration
schedule.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

_HI = jax.lax.Precision.HIGHEST


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(jnp.sum(leaf))


def timed(f, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = f(*args)
    _sync(out)
    best = float('inf')
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print('devices:', jax.devices(), file=sys.stderr)
    N, t = 100_000, 6
    offsets = (1, 347)
    n_off = len(offsets)
    rng = np.random.default_rng(0)

    sym = rng.standard_normal((N, t, t)).astype(np.float32) * 0.1
    Ablk = 10.0 * np.eye(t, dtype=np.float32) + sym + sym.transpose(0, 2, 1)
    C = rng.standard_normal((n_off, N, t, t)).astype(np.float32) * 0.8
    b = rng.standard_normal((N, t)).astype(np.float32)
    Minv = np.linalg.inv(Ablk).astype(np.float32)

    Ablk, C, b, Minv = map(jnp.asarray, (Ablk, C, b, Minv))

    def couple(C, x):
        y = jnp.zeros_like(x)
        for k, d in enumerate(offsets):
            xr = jnp.roll(x, -d, axis=0)
            y = y + jnp.einsum('ntu,nu->nt', C[k], xr, precision=_HI)
            back = jnp.einsum('ntu,nt->nu', C[k], x, precision=_HI)
            y = y + jnp.roll(back, d, axis=0)
        return y

    @functools.partial(jax.jit, static_argnames='maxiter')
    def einsum_cg(b, Ablk, C, Minv, maxiter):
        def Avp(x):
            return jnp.einsum('ntu,nu->nt', Ablk, x, precision=_HI) \
                + couple(C, x)

        def M(x):
            return jnp.einsum('ntu,nu->nt', Minv, x, precision=_HI)

        r0 = b
        z0 = M(r0)
        gamma0 = jnp.sum(r0 * z0)

        def cond(st):
            x, r, z, p, gamma, it = st
            return (it < maxiter) & (jnp.sum(r * r) > 0.0)

        def body(st):
            x, r, z, p, gamma, it = st
            Ap = Avp(p)
            alpha = gamma / jnp.sum(p * Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            gamma_new = jnp.sum(r * z)
            p = z + (gamma_new / gamma) * p
            return (x, r, z, p, gamma_new, it + 1)

        st = (jnp.zeros_like(b), r0, z0, z0, gamma0,
              jnp.asarray(0, jnp.int32))
        x, _, _, _, _, it = jax.lax.while_loop(cond, body, st)
        return x, it

    def report(name, run, args10, args100):
        t10 = timed(lambda: run(*args10))
        t100 = timed(lambda: run(*args100))
        out100 = run(*args100)
        it = int(jax.device_get(out100[1]))
        span = max(it, 10) - 10
        per = (t100 - t10) / max(span, 1)
        print(f'[{name}] per-iter {per*1e6:.1f} us, '
              f'fixed {1e3*(t10 - 10*per):.2f} ms '
              f'(10it {t10*1e3:.2f} ms, 100it {t100*1e3:.2f} ms, it={it})',
              file=sys.stderr)
        return out100[0]

    x_e = report('einsum-cg', lambda b_, A_, C_, M_, mi: einsum_cg(
        b_, A_, C_, M_, maxiter=mi),
        (b, Ablk, C, Minv, 10), (b, Ablk, C, Minv, 100))

    from pypose_tpu.ops.pallas_cg import stencil_cg_fused

    b_T = b.T
    A_T = jnp.transpose(Ablk, (1, 2, 0)).reshape(t * t, N)
    Minv_T = jnp.transpose(Minv, (1, 2, 0)).reshape(t * t, N)
    C_T = jnp.transpose(C, (0, 2, 3, 1)).reshape(n_off * t * t, N)

    for dt_name, od in [('f32', None), ('bf16', jnp.bfloat16)]:
        for tile in (4096, 8192):
            run = jax.jit(functools.partial(
                stencil_cg_fused, offsets=offsets, t=t, tol=0.0, tile=tile,
                operand_dtype=od), static_argnames='maxiter')
            try:
                x_f = report(f'fused-{dt_name} tile={tile}',
                             lambda mi, r=run: r(b_T, A_T, Minv_T, C_T,
                                                 maxiter=mi),
                             (10,), (100,))
            except Exception as e:  # noqa: BLE001
                msg = str(e).split('\n')[0][:200]
                print(f'[fused-{dt_name} tile={tile}] FAILED: {msg}',
                      file=sys.stderr)
                continue
            err = float(jnp.max(jnp.abs(x_e - x_f.T))
                        / jnp.max(jnp.abs(x_e)))
            print(f'[check fused-{dt_name} tile={tile}] rel err vs '
                  f'einsum: {err:.2e}', file=sys.stderr)


if __name__ == '__main__':
    main()
