"""Per-op breakdown of the bench [micro] SE3 chain at N=1e5.

The bench's fused Exp+Log+Jl+Act chain measured 13.15 ms/iter (r4) —
~400x off the ~30 us HBM roofline for its logical bytes.  Suspect:
se3_Jl's ~12 batched 3x3 matmuls each materializing (8,128)-padded
[N,3,3] temps (~410 MB apiece).  This times each op separately with the
device_get-synced block-differencing recipe (CLAUDE.md).

Usage: timeout 900 python tools/microchain_prof.py
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import pypose_tpu as pp  # noqa: E402
from pypose_tpu.lietensor.jacobian import se3_Jl, so3_Jl, calcQ  # noqa: E402

N = 100_000


def sync_get(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    jax.device_get(leaf.ravel()[:1])


def per_call(fn, n_lo=5, n_hi=25, repeats=5):
    def block(n):
        best = float('inf')
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            sync_get(out)
            best = min(best, time.perf_counter() - t0)
        return best
    return max(block(n_hi) - block(n_lo), 1e-12) / (n_hi - n_lo)


def main():
    print('devices:', jax.devices(), flush=True)
    x = pp.randn_se3(N, key=jax.random.PRNGKey(0))
    X = x.Exp()
    p = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    xd, Xd = x.tensor(), X.tensor()

    ops = {
        'Exp': jax.jit(lambda xd: pp.se3(xd).Exp().tensor()),
        'Log': jax.jit(lambda Xd: pp.SE3(Xd).Log().tensor()),
        'Act': jax.jit(lambda Xd, p: pp.SE3(Xd).Act(p)),
        'so3_Jl': jax.jit(lambda xd: so3_Jl(xd[..., 3:6])),
        'calcQ': jax.jit(lambda xd: calcQ(xd)),
        'se3_Jl': jax.jit(lambda xd: se3_Jl(xd)),
        'se3_Jl+slice': jax.jit(lambda xd: se3_Jl(xd)[..., 0, 0:6]),
    }
    args = {'Exp': (xd,), 'Log': (Xd,), 'Act': (Xd, p),
            'so3_Jl': (xd,), 'calcQ': (xd,), 'se3_Jl': (xd,),
            'se3_Jl+slice': (xd,)}

    for name, fn in ops.items():
        a = args[name]
        fn(*a)  # compile
        dt = per_call(lambda: fn(*a))
        print(f'{name:16s}: {dt*1e3:8.3f} ms/call = {N/dt:.3e} elem/s',
              flush=True)


if __name__ == '__main__':
    main()
