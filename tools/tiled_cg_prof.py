r"""Head-to-head on the real TPU at 100k poses: SparseLM's einsum-CG
(the current default past the whole-CG kernel's VMEM budget) vs the
HBM-streamed tiled Pallas CG (ops/pallas_cg.py:stencil_cg_tiled).

Per-iteration cost is isolated by running the same solve at two maxiter
values with tol=0 (no early exit) and differencing.

Run:  timeout 600 python tools/tiled_cg_prof.py   (takes the TPU tunnel)
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
    """block_until_ready alone does not sync through the remote tunnel —
    force a real device->host readback of one scalar."""
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

    # strong couplings: keeps CG from converging (and the residual from
    # underflowing to exact zero, which with tol=0 exits the loop early
    # and corrupts the per-iter differencing)
    sym = rng.standard_normal((N, t, t)).astype(np.float32) * 0.1
    Ablk = 10.0 * np.eye(t, dtype=np.float32) + sym + sym.transpose(0, 2, 1)
    C = rng.standard_normal((n_off, N, t, t)).astype(np.float32) * 0.8
    b = rng.standard_normal((N, t)).astype(np.float32)
    Minv = np.linalg.inv(Ablk).astype(np.float32)
    dcorr = np.zeros((N, t), np.float32)

    Ablk, C, b, Minv, dcorr = map(jnp.asarray, (Ablk, C, b, Minv, dcorr))

    # ---- A: the einsum CG (SparseLM's current oversize path) ----------
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
        """Same PCG recursion as ops/pallas_cg._cg_body, [N, t] einsum
        layout, returning the executed iteration count."""
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

    for name, fn in [('einsum-cg', einsum_cg)]:
        t10 = timed(lambda: fn(b, Ablk, C, Minv, maxiter=10))
        t100 = timed(lambda: fn(b, Ablk, C, Minv, maxiter=100))
        _, it100 = fn(b, Ablk, C, Minv, maxiter=100)
        per = (t100 - t10) / 90
        print(f'[{name}] per-iter {per*1e6:.1f} us, '
              f'fixed {1e3*(t10 - 10*per):.2f} ms '
              f'(10it {t10*1e3:.2f} ms, 100it {t100*1e3:.2f} ms, '
              f'it={int(jax.device_get(it100))})',
              file=sys.stderr)

    # ---- B: the tiled Pallas CG ---------------------------------------
    from pypose_tpu.ops.pallas_cg import stencil_cg_tiled

    b_T = b.T
    A_T = jnp.transpose(Ablk, (1, 2, 0)).reshape(t * t, N)
    Minv_T = jnp.transpose(Minv, (1, 2, 0)).reshape(t * t, N)
    C_T = jnp.transpose(C, (0, 2, 3, 1)).reshape(n_off * t * t, N)

    for tile in (4096, 8192):
        run = jax.jit(functools.partial(
            stencil_cg_tiled, offsets=offsets, t=t, tol=0.0, tile=tile),
            static_argnames='maxiter')
        try:
            t10 = timed(lambda: run(b_T, A_T, Minv_T, C_T, maxiter=10))
            t100 = timed(lambda: run(b_T, A_T, Minv_T, C_T, maxiter=100))
        except Exception as e:  # noqa: BLE001
            print(f'[tiled tile={tile}] FAILED: {e}', file=sys.stderr)
            continue
        _, it100 = run(b_T, A_T, Minv_T, C_T, maxiter=100)
        per = (t100 - t10) / 90
        print(f'[tiled tile={tile}] per-iter {per*1e6:.1f} us, '
              f'fixed {1e3*(t10 - 10*per):.2f} ms '
              f'(10it {t10*1e3:.2f} ms, 100it {t100*1e3:.2f} ms, '
              f'it={int(jax.device_get(it100))})',
              file=sys.stderr)

    # correctness cross-check at maxiter=100
    x_e, _ = einsum_cg(b, Ablk, C, Minv, maxiter=100)
    x_t, _ = jax.jit(functools.partial(
        stencil_cg_tiled, offsets=offsets, t=t, tol=0.0, tile=8192),
        static_argnames='maxiter')(b_T, A_T, Minv_T, C_T, maxiter=100)
    err = float(jnp.max(jnp.abs(x_e - x_t.T)) / jnp.max(jnp.abs(x_e)))
    print(f'[check] rel err einsum vs tiled: {err:.2e}', file=sys.stderr)


if __name__ == '__main__':
    main()
