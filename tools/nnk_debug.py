r"""Minimal hardware isolation for the nnk kernel: single-tile (pure
extraction) vs multi-tile (merge) on tiny shapes."""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')


def check(tag, R, N, k, tr, tn):
    from pypose_tpu.ops.pallas_knn import nnk
    rng = np.random.default_rng(3)
    ref = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    nbr = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    d2, idx = jax.jit(lambda r, n: nnk(r, n, k, tr=tr, tn=tn))(ref, nbr)
    D2 = ((np.asarray(ref)[:, None] - np.asarray(nbr)[None]) ** 2).sum(-1)
    order = np.argsort(D2, axis=1)[:, :k]
    ref_d2 = np.take_along_axis(D2, order, axis=1)
    dv = np.abs(np.asarray(d2) - ref_d2).max()
    m = (np.asarray(idx) == order).mean()
    print(f'[{tag}] R={R} N={N} k={k} tr={tr} tn={tn}: '
          f'max|d2 diff|={dv:.3e} idx match={m:.4f}', flush=True)
    if m < 0.99:
        print('  kernel idx[:3]:', np.asarray(idx)[:3].tolist(), flush=True)
        print('  oracle idx[:3]:', order[:3].tolist(), flush=True)
        print('  kernel d2[:3] :', np.asarray(d2)[:3].round(3).tolist(),
              flush=True)
        print('  oracle d2[:3] :', ref_d2[:3].round(3).tolist(), flush=True)


def main():
    print('devices:', jax.devices(), flush=True)
    check('single-tile', 128, 128, 2, 128, 128)   # extraction only (j=0)
    check('two-tile', 128, 256, 2, 128, 128)      # extraction + 1 merge
    check('k4', 128, 512, 4, 128, 128)
    check('tr512', 1024, 512, 4, 512, 128)        # big ref tile
    check('tn2048', 128, 8192, 4, 128, 2048)      # big nbr tile
    check('default', 2048, 8192, 4, 512, 2048)    # production tiles


if __name__ == '__main__':
    main()
