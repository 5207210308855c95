r"""CPU experiment: can an FFT-diagonalized block-circulant preconditioner
collapse the 100k-pose PGO CG iteration count?

The stencil matvec is H x = D x + sum_d [ C_d roll(x,-d) + roll(C_d^T x, d) ]
with per-node blocks D [N,t,t] and offset channels C_d [N,t,t].  The
circulant surrogate replaces per-node blocks by their mean, which the DFT
block-diagonalizes into N independent t x t Hermitian systems:

    Hhat(k) = Dbar + sum_d ( Cbar_d e^{+i theta_k d} + Cbar_d^T e^{-i theta_k d} )

(jnp.fft convention: y_n = C x_{n+d}  =>  Y_k = C X_k e^{+2 pi i k d / N}).

Variant 'scaled': symmetric block-Jacobi normalization first — with
L_n = chol(D_n + damping), scale Chat_d[n] = L_n^{-1} C_d[n] L_{n+d}^{-T};
surrogate of the scaled system has identity diagonal; apply
M^{-1} r = L^{-T} circinv( L^{-1} r ).  This absorbs the per-node block
variation (Adj(Xi^{-1}) translations) that makes the raw mean poor.

Counts PCG iterations to ||r||/||b|| <= tol for: block-Jacobi, raw
circulant, scaled circulant.  Pure CPU.
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def build(N=5000, damping=1e-4):
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import (SparseLM, pgo_factor,
                                         split_chain_edges)
    from pypose_tpu.optim.strategy import TrustRegion

    ds = synthetic_sphere(N)
    edges = jnp.asarray(ds['edges'])
    runs, rest = split_chain_edges(edges)
    factors = [pgo_factor(edges[jnp.asarray(r)],
                          ds['poses'][jnp.asarray(r)]) for r in runs]
    if len(rest):
        factors.append(pgo_factor(edges[jnp.asarray(rest)],
                                  ds['poses'][jnp.asarray(rest)]))
    fixed = {'poses': jnp.zeros(N, bool).at[0].set(True)}
    lm = SparseLM({'poses': ds['nodes']}, factors,
                  strategy=TrustRegion(radius=1e4), fixed=fixed,
                  cg_iter=250, cg_tol=1e-6)
    assert lm._stencil_all is not None, 'stencil form required'

    params = dict(lm.params)
    fdata = lm._factor_data()
    blocks = [lm._weighted(f, fd, *lm._edge_r_jac(params, f, fd, fi))
              for fi, (f, fd) in enumerate(zip(lm.factors, fdata))]
    b = lm._rhs(blocks, fdata)['poses']
    diag_raw = lm._diag(blocks, fdata)['poses']
    diagA = jnp.clip(diag_raw, lm.min, lm.max)
    accum = lm._block_diag_accum(blocks, fdata)['poses']
    nm = 'poses'
    C_all = lm._stencil_all.precompute_multi(
        [(blk[1][nm], blk[3][nm]) for blk in blocks])
    offsets = list(lm._stencil_all.offsets)
    mask = np.asarray(fixed['poses'])

    # damped diag correction the solve() path applies
    dcorr = np.asarray(diagA - diag_raw + damping * diagA)   # [N, t]
    D = np.asarray(accum)                                    # [N, t, t]
    Dd = D + np.einsum('nt,tu->ntu', dcorr, np.eye(D.shape[-1]))
    C = np.asarray(C_all)                                    # [n_off, N, t, t]
    from pypose_tpu.lietensor import operation as _op
    Adj_nodes = np.asarray(_op.SE3_Adj(ds['nodes'].Inv().tensor()))
    return np.asarray(b), Dd, C, offsets, mask, Adj_nodes


def matvec(Dd, C, offsets, mask, x):
    xm = np.where(mask[:, None], 0.0, x)
    y = np.einsum('ntu,nu->nt', Dd, xm)
    for k, d in enumerate(offsets):
        xr = np.roll(xm, -d, axis=0)
        y += np.einsum('ntu,nu->nt', C[k], xr)
        y += np.roll(np.einsum('ntu,nt->nu', C[k], xm), d, axis=0)
    return np.where(mask[:, None], 0.0, y)


def pcg_iters(A, M, b, tol=1e-6, maxiter=2000):
    x = np.zeros_like(b)
    r = b.copy()
    z = M(r)
    p = z.copy()
    rz = np.vdot(r, z).real
    nb = np.linalg.norm(b)
    for it in range(maxiter):
        if np.linalg.norm(r) <= tol * nb:
            return it, np.linalg.norm(r) / nb
        Ap = A(p)
        alpha = rz / np.vdot(p, Ap).real
        x += alpha * p
        r -= alpha * Ap
        z = M(r)
        rz_new = np.vdot(r, z).real
        p = z + (rz_new / rz) * p
        rz = rz_new
    return maxiter, np.linalg.norm(r) / nb


def make_jacobi(Dd, mask):
    inv = np.linalg.inv(Dd)
    def M(r):
        y = np.einsum('ntu,nu->nt', inv, r)
        return np.where(mask[:, None], r, y)
    return M


def circ_inverse(Dbar, Cbar, offsets, N):
    """[K, t, t] inverse of the rfft-domain surrogate blocks."""
    t = Dbar.shape[-1]
    K = N // 2 + 1
    theta = 2 * np.pi * np.arange(K) / N
    H = np.broadcast_to(Dbar, (K, t, t)).astype(np.complex128).copy()
    for k, d in enumerate(offsets):
        ph = np.exp(1j * theta * d)[:, None, None]
        H += Cbar[k] * ph + Cbar[k].T.conj() * np.conj(ph)
    return np.linalg.inv(H)


def make_circ(Dd, C, offsets, mask):
    N, t = Dd.shape[0], Dd.shape[-1]
    Hinv = circ_inverse(Dd.mean(0), C.mean(1), offsets, N)
    def M(r):
        R = np.fft.rfft(r, axis=0)
        Z = np.einsum('ktu,ku->kt', Hinv, R)
        y = np.fft.irfft(Z, n=N, axis=0)
        return np.where(mask[:, None], r, y)
    return M


def make_scaled_circ(Dd, C, offsets, mask):
    N, t = Dd.shape[0], Dd.shape[-1]
    L = np.linalg.cholesky(Dd)
    Linv = np.linalg.inv(L)
    # scaled channels: Chat_d[n] = Linv[n] C_d[n] Linv[(n+d) % N]^T
    Chat = np.empty_like(C)
    for k, d in enumerate(offsets):
        Linv_roll = np.roll(Linv, -d, axis=0)
        Chat[k] = np.einsum('ntu,nuv,nwv->ntw', Linv, C[k], Linv_roll)
    Hinv = circ_inverse(np.eye(t), Chat.mean(1), offsets, N)
    def M(r):
        z = np.einsum('nut,nu->nt', Linv, r)        # L^{-1} r  (Linv^T? no:)
        # Linv is lower-tri inverse of L: L^{-1} r is einsum('ntu,nu->nt')
        z = np.einsum('ntu,nu->nt', Linv, r)
        Z = np.fft.rfft(z, axis=0)
        Z = np.einsum('ktu,ku->kt', Hinv, Z)
        z = np.fft.irfft(Z, n=N, axis=0)
        y = np.einsum('nut,nu->nt', Linv, z)        # L^{-T} z
        return np.where(mask[:, None], r, y)
    return M


def make_adj_circ(Dd, C, offsets, mask, Adj_nodes):
    """Conjugate per-node by S_n = Adj(X_n^{-1}): each PGO edge (i,j)
    contributes [S_i^T G S_i, -S_i^T G S_i; ...] with G = Q_e^T W Q_e
    slowly varying (J_j = Jl_inv(r) Adj(Z^-1) Adj(Xi^-1)), so the
    S-transformed system is a near-constant-coefficient block Laplacian
    the circulant mean actually represents."""
    N, t = Dd.shape[0], Dd.shape[-1]
    S = Adj_nodes                      # [N, t, t] = Adj(X_n^{-1})
    Sinv = np.linalg.inv(S)
    # Hhat = Sinv^T H Sinv ; couplings Chat_d[n] = Sinv[n]^T C_d[n] Sinv[n+d]
    Dhat = np.einsum('nut,nuv,nvw->ntw', Sinv, Dd, Sinv)
    Chat = np.empty_like(C)
    for k, d in enumerate(offsets):
        Sinv_roll = np.roll(Sinv, -d, axis=0)
        Chat[k] = np.einsum('nut,nuv,nvw->ntw', Sinv, C[k], Sinv_roll)
    Hinv = circ_inverse(Dhat.mean(0), Chat.mean(1), offsets, N)
    def M(r):
        z = np.einsum('ntu,nt->nu', Sinv, r)        # Sinv^T r
        Z = np.fft.rfft(z, axis=0)
        Z = np.einsum('ktu,ku->kt', Hinv, Z)
        z = np.fft.irfft(Z, n=N, axis=0)
        y = np.einsum('ntu,nu->nt', Sinv, z)        # Sinv z
        return np.where(mask[:, None], r, y)
    return M


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    damping = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
    tol = 1e-6
    print(f'N={N} damping={damping} tol={tol}')
    b, Dd, C, offsets, mask, Adj_nodes = build(N, damping)
    print('offsets:', offsets, 'blocks t =', Dd.shape[-1])
    A = lambda x: matvec(Dd, C, offsets, mask, x)
    b = np.where(mask[:, None], 0.0, b)

    for name, mk in [('block-jacobi', make_jacobi),
                     ('circulant', make_circ),
                     ('scaled-circulant', make_scaled_circ),
                     ('adj-circulant', make_adj_circ)]:
        t0 = time.time()
        if mk is make_jacobi:
            M = mk(Dd, mask)
        elif mk is make_adj_circ:
            M = mk(Dd, C, offsets, mask, Adj_nodes)
        else:
            M = mk(Dd, C, offsets, mask)
        its, res = pcg_iters(A, M, b, tol=tol)
        print(f'{name:18s} iters={its:5d}  final_rel={res:.2e}  '
              f'(setup+solve {time.time()-t0:.1f}s)')


if __name__ == '__main__':
    main()


def diag_mode():
    """Diagnostics: (1) FFT apply vs dense block-circulant inverse at
    small N; (2) per-node variation of the (transformed) channels."""
    N = 512
    b, Dd, C, offsets, mask, Adj = build(N, 1e-4)
    t = Dd.shape[-1]
    # dense surrogate
    Dbar, Cbar = Dd.mean(0), C.mean(1)
    H = np.zeros((N * t, N * t))
    for n in range(N):
        H[n*t:(n+1)*t, n*t:(n+1)*t] = Dbar
    for k, d in enumerate(offsets):
        for n in range(N):
            j = (n + d) % N
            H[n*t:(n+1)*t, j*t:(j+1)*t] += Cbar[k]
            H[j*t:(j+1)*t, n*t:(n+1)*t] += Cbar[k].T
    rng = np.random.default_rng(0)
    r = rng.standard_normal((N, t))
    y_dense = np.linalg.solve(H, r.ravel()).reshape(N, t)
    Hinv = circ_inverse(Dbar, Cbar, offsets, N)
    R = np.fft.rfft(r, axis=0)
    y_fft = np.fft.irfft(np.einsum('ktu,ku->kt', Hinv, R), n=N, axis=0)
    print('FFT-vs-dense surrogate apply rel err:',
          np.linalg.norm(y_fft - y_dense) / np.linalg.norm(y_dense))

    # variation stats
    def var_stats(name, Dh, Ch):
        dm = Dh.mean(0)
        dv = np.linalg.norm(Dh - dm, axis=(1, 2)) / np.linalg.norm(dm)
        print(f'{name}: D var median={np.median(dv):.3f} p95={np.percentile(dv,95):.3f}')
        for k, d in enumerate(offsets):
            cm = Ch[k].mean(0)
            cv = np.linalg.norm(Ch[k] - cm, axis=(1, 2)) / max(np.linalg.norm(cm), 1e-30)
            nz = np.linalg.norm(Ch[k], axis=(1, 2)) > 1e-12
            cvn = np.linalg.norm(Ch[k][nz] - cm, axis=(1, 2)) / max(np.linalg.norm(cm), 1e-30)
            print(f'  offset {d}: fill={nz.mean():.2f} var median={np.median(cv):.3f} '
                  f'nonzero-only median={np.median(cvn):.3f}')

    var_stats('raw', Dd, C)
    Sinv = np.linalg.inv(Adj)
    Dhat = np.einsum('nut,nuv,nvw->ntw', Sinv, Dd, Sinv)
    Chat = np.empty_like(C)
    for k, d in enumerate(offsets):
        Chat[k] = np.einsum('nut,nuv,nvw->ntw', Sinv, C[k], np.roll(Sinv, -d, axis=0))
    var_stats('adj-conjugated', Dhat, Chat)


if __name__ == '__main__' and len(sys.argv) > 1 and sys.argv[1] == 'diag':
    pass
