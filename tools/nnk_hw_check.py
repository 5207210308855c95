r"""Hardware validation + timing for the running-top-k Pallas kernel.

The nn1 kernel needed a real-chip check once (Mosaic 1-D layout trap,
commit b6741b4); nnk adds [k, Tr] output blocks and an unrolled merge,
so it gets the same treatment: exact comparison against the XLA
lax.map/top_k path on a 2k-row slice, then timing at 100k x 100k
(where the XLA path moves 40 GB of distance tiles per sweep).

Run:  timeout 1200 python tools/nnk_hw_check.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')


def sync(out):
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def timed(fn, iters=5):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    print('devices:', jax.devices(), file=sys.stderr)
    from pypose_tpu.ops.pallas_knn import nnk

    rng = np.random.default_rng(0)
    N = 100_000
    nbr = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32) * 10.0
    ref = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32) * 10.0

    # correctness: 2k-row slice vs an EXACT float64 host oracle.  (An
    # XLA `tile @ nbr.T` oracle at DEFAULT precision is a single-pass
    # bf16 matmul — with +-30-range coordinates its d2 error is O(10),
    # which once produced a false "hardware mismatch" here.)
    k = 4
    sub = ref[:2048]
    d2_p, idx_p = jax.jit(lambda r, n: nnk(r, n, k))(sub, nbr)
    r64 = np.asarray(sub, np.float64)
    n64 = np.asarray(nbr, np.float64)
    D2 = (np.sum(r64 * r64, -1)[:, None] + np.sum(n64 * n64, -1)[None, :]
          - 2.0 * (r64 @ n64.T))
    order = np.argsort(D2, axis=1)[:, :k]
    ref_d2 = np.take_along_axis(D2, order, axis=1)
    dv = np.abs(np.asarray(d2_p) - ref_d2)
    # the kernel's f32 Gram carries ~|a||b|*eps_f32 cancellation error;
    # index flips are legitimate where the true gap is below that
    gap = np.diff(ref_d2, axis=1) > 1e-2
    clear = np.concatenate([np.ones((len(ref_d2), 1), bool), gap], 1)
    match = (np.asarray(idx_p) == order)[clear].mean()
    print(f'[correctness] k={k}: max |d2 diff| = {dv.max():.3e}, '
          f'idx match (clear gaps) = {match:.4f}', file=sys.stderr)
    assert dv.max() < 5e-2 and match > 0.999, 'hardware mismatch'

    # timing at 100k x 100k
    for kk in (1, 4, 8):
        f = jax.jit(lambda r, n, kk=kk: nnk(r, n, kk))
        t = timed(lambda: f(ref, nbr))
        print(f'[nnk] k={kk}: {t*1e3:.1f} ms per 100k x 100k sweep',
              file=sys.stderr)

    # XLA lax.map fallback for contrast at k=4 (chunked to fit HBM)
    nbr2 = jnp.sum(nbr * nbr, axis=-1)

    @jax.jit
    def xla_sweep(refv):
        tiles = refv.reshape(-1, 500, 3)
        def one(tile):
            g = tile @ nbr.T
            d2 = jnp.maximum(jnp.sum(tile * tile, -1)[:, None]
                             + nbr2[None, :] - 2.0 * g, 0.0)
            v, i = jax.lax.top_k(-d2, 4)
            return -v, i
        return jax.lax.map(one, tiles)
    t = timed(lambda: xla_sweep(ref), iters=2)
    print(f'[xla] k=4 lax.map path: {t*1e3:.1f} ms per sweep',
          file=sys.stderr)
    print('OK')


if __name__ == '__main__':
    main()
