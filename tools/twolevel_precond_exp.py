r"""CPU experiment: two-level (Galerkin coarse-grid) preconditioning of
the stencil-form PGO normal equations (r4 verdict directive #2c).

The r4 circulant negative (tools/circulant_precond_exp.py) rules out
constant-coefficient surrogates — the per-edge coefficient variation is
what kills them.  A Galerkin coarse grid KEEPS the actual coefficients:
aggregate s consecutive poses (piecewise-constant prolongation P over
the 6 tangent dims), form Ac = P^T A P exactly from the stencil
channels, solve Ac directly, and combine with block-Jacobi smoothing:

  additive:        M r = M_J r + P Ac^{-1} P^T r
  symmetric V(1,1): pre-smooth M_J, coarse-correct, post-smooth M_J
                    (2 extra fine matvecs per apply)

Counts PCG iterations to ||r||/||b|| <= 1e-6 against block-Jacobi, at
several aggregate sizes.  Iteration counts are hardware-independent —
pure CPU; only the ms/iter tradeoff needs the chip.

MEASURED (r5, N=5000, damping=1e-4, offsets [1, 222]):
  block-jacobi 459 iters; additive s=16/32/64/128 = 423/463/489/517;
  V(1,1) s=16/32/64/128 = 374/398/434/460.  NEGATIVE: the best case
  (s=16 V-cycle) removes 18% of iterations but each apply costs 2 extra
  fine matvecs (~3x per-iteration bytes) plus a coarse Cholesky solve —
  a >2x end-to-end loss.  Additive barely moves at all.  This extends
  the r4 circulant negative: even with EXACT per-aggregate Galerkin
  coefficients, coarse low-frequency correction buys almost nothing —
  block-Jacobi on these sphere graphs is limited by per-node/per-edge
  coefficient variation, not long-range chain structure.

Run:  timeout 1800 python tools/twolevel_precond_exp.py [N] [damping]
"""

import sys

import numpy as np

sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_platforms', 'cpu')

from circulant_precond_exp import build, matvec, pcg_iters, make_jacobi


def build_coarse(Dd, C, offsets, mask, s):
    """Dense Galerkin coarse operator for aggregates of s consecutive
    nodes.  Edges touching masked (gauge-fixed) nodes contribute zero,
    matching the fine operator's masked matvec."""
    N, t = Dd.shape[0], Dd.shape[-1]
    Nc = -(-N // s)
    g = np.arange(N) // s                       # fine -> aggregate
    keep = ~mask
    n_dim = Nc * t
    Ac = np.zeros((n_dim, n_dim))
    # diagonal blocks
    for i in np.nonzero(keep)[0]:
        gi = g[i]
        Ac[gi * t:(gi + 1) * t, gi * t:(gi + 1) * t] += Dd[i]
    # coupling channels (circular, matching np.roll in the fine matvec)
    for k, d in enumerate(offsets):
        j = (np.arange(N) + d) % N
        ok = keep & keep[j]
        for i in np.nonzero(ok)[0]:
            gi, gj = g[i], g[j[i]]
            blk = C[k][i]
            Ac[gi * t:(gi + 1) * t, gj * t:(gj + 1) * t] += blk
            Ac[gj * t:(gj + 1) * t, gi * t:(gi + 1) * t] += blk.T
    # aggregates with no unmasked support would be singular
    Ac += 1e-8 * np.eye(n_dim)
    return Ac, g, Nc


def make_twolevel(Dd, C, offsets, mask, s, mode='additive'):
    N, t = Dd.shape[0], Dd.shape[-1]
    Ac, g, Nc = build_coarse(Dd, C, offsets, mask, s)
    from scipy.linalg import cho_factor, cho_solve
    cf = cho_factor(Ac)
    inv = np.linalg.inv(Dd)

    def jac(r):
        y = np.einsum('ntu,nu->nt', inv, r)
        return np.where(mask[:, None], r, y)

    def coarse(r):
        rc = np.zeros((Nc, t))
        np.add.at(rc, g, np.where(mask[:, None], 0.0, r))
        zc = cho_solve(cf, rc.reshape(-1)).reshape(Nc, t)
        z = zc[g]
        return np.where(mask[:, None], 0.0, z)

    if mode == 'additive':
        def M(r):
            return jac(r) + coarse(r)
        return M

    def A(x):
        return matvec(Dd, C, offsets, mask, x)

    def M(r):                                   # symmetric V(1,1)
        z = jac(r)
        z = z + coarse(r - A(z))
        z = z + jac(r - A(z))
        return z
    return M


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    damping = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
    tol = 1e-6
    print(f'N={N} damping={damping} tol={tol}', flush=True)
    b, Dd, C, offsets, mask, _ = build(N, damping)
    print('offsets:', offsets, 'blocks t =', Dd.shape[-1], flush=True)
    A = lambda x: matvec(Dd, C, offsets, mask, x)
    b = np.where(mask[:, None], 0.0, b)

    it, res = pcg_iters(A, make_jacobi(Dd, mask), b, tol=tol)
    print(f'[block-jacobi] iters={it} rel={res:.2e}', flush=True)
    for s in (16, 32, 64, 128):
        for mode in ('additive', 'vcycle'):
            M = make_twolevel(Dd, C, offsets, mask, s, mode)
            it, res = pcg_iters(A, M, b, tol=tol)
            print(f'[twolevel s={s} {mode}] iters={it} rel={res:.2e}',
                  flush=True)
    print('OK')


if __name__ == '__main__':
    main()
