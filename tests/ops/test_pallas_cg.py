"""Whole-CG stencil kernel: XLA fallback correctness vs dense solve, and
the Pallas path in interpreter mode (CPU CI has no TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pypose_tpu.ops.pallas_cg import stencil_cg
from pypose_tpu.ops.spmv import StencilSpMV


def make_system(N=40, t=6, seed=0):
    """SPD stencil system from a synthetic chain+loop pose graph."""
    rng = np.random.default_rng(seed)
    chain = np.stack([np.arange(N - 1), np.arange(1, N)], 1)
    li = rng.integers(0, N, 15)
    loops = np.stack([li, (li + 9) % N], 1)
    edges = np.concatenate([chain, loops], 0)
    E = edges.shape[0]
    J = rng.normal(size=(E, 6, 2, t)).astype(np.float32)
    WJ = J.copy()
    sp = StencilSpMV(edges, N, t)
    C = sp.precompute(jnp.asarray(J), jnp.asarray(WJ))
    D = np.zeros((N, t, t), np.float32)
    for e in range(E):
        i, j = edges[e]
        D[i] += J[e, :, 0, :].T @ J[e, :, 0, :]
        D[j] += J[e, :, 1, :].T @ J[e, :, 1, :]
    # damping correction as SparseLM applies it
    damping = 0.1
    diag = np.einsum('ntt->nt', D)
    dcorr = damping * np.clip(diag, 1e-6, 1e32)
    A_dense = np.zeros((N * t, N * t))
    for e in range(E):
        i, j = edges[e]
        Jf = np.zeros((6, N * t))
        Jf[:, i * t:(i + 1) * t] = J[e, :, 0, :]
        Jf[:, j * t:(j + 1) * t] = J[e, :, 1, :]
        A_dense += Jf.T @ Jf
    A_dense += np.diag(dcorr.reshape(-1))
    from pypose_tpu.ops.smallinv import blockinv
    Minv = np.asarray(blockinv(jnp.asarray(
        D + dcorr[..., None] * np.eye(t, dtype=np.float32))))
    b = rng.normal(size=(N, t)).astype(np.float32)
    return sp, C, D, dcorr, Minv, b, A_dense


def test_stencil_cg_xla_matches_dense_solve():
    sp, C, D, dcorr, Minv, b, A_dense = make_system()
    x, it = stencil_cg(jnp.asarray(b), jnp.asarray(D),
                       jnp.asarray(dcorr, jnp.float32), jnp.asarray(Minv),
                       C, tuple(sp.offsets), maxiter=400, tol=1e-7,
                       use_pallas=False)
    x_ref = np.linalg.solve(A_dense, b.reshape(-1)).reshape(b.shape)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=5e-3, atol=5e-4)
    assert int(it) < 400  # converged before the cap


def test_stencil_cg_fixed_mask():
    sp, C, D, dcorr, Minv, b, A_dense = make_system(seed=2)
    N, t = b.shape
    fixed = np.zeros(N, bool)
    fixed[0] = True
    x, _ = stencil_cg(jnp.asarray(b), jnp.asarray(D),
                      jnp.asarray(dcorr, jnp.float32), jnp.asarray(Minv),
                      C, tuple(sp.offsets), fixed_mask=jnp.asarray(fixed),
                      maxiter=400, tol=1e-7, use_pallas=False)
    x = np.asarray(x)
    np.testing.assert_allclose(x[0], 0.0, atol=1e-7)
    # solving the reduced system (rows/cols of node 0 deleted) must agree
    keep = np.ones(N * t, bool)
    keep[:t] = False
    A_red = A_dense[np.ix_(keep, keep)]
    x_red = np.linalg.solve(A_red, b.reshape(-1)[keep])
    np.testing.assert_allclose(x.reshape(-1)[keep], x_red, rtol=5e-3,
                               atol=5e-4)


def test_stencil_cg_pallas_interpret_matches_xla():
    """The Pallas kernel (interpreter mode off-TPU) computes the same
    solution as the XLA fallback."""
    from jax.experimental.pallas import tpu as pltpu
    sp, C, D, dcorr, Minv, b, _ = make_system(seed=3)
    args = (jnp.asarray(b), jnp.asarray(D), jnp.asarray(dcorr, jnp.float32),
            jnp.asarray(Minv), C, tuple(sp.offsets))
    x_ref, it_ref = stencil_cg(*args, maxiter=150, tol=1e-6,
                               use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        x_pl, it_pl = stencil_cg(*args, maxiter=150, tol=1e-6,
                                 use_pallas=True)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)
    assert abs(int(it_pl) - int(it_ref)) <= 1


def test_stencil_cg_tiled_matches_xla():
    """The HBM-streamed tiled path (used past the whole-CG kernel's VMEM
    budget) computes the same solution as the XLA fallback, including
    non-divisible N (padding) and roll wraparound at N."""
    from pypose_tpu.ops.pallas_cg import stencil_cg_tiled, _cg_body
    sp, C, D, dcorr, Minv, b, _ = make_system(N=53, seed=5)
    N, t = b.shape
    n_off = len(sp.offsets)
    eye = np.eye(t, dtype=np.float32)
    Ablk = np.asarray(D) + np.asarray(dcorr)[..., None] * eye
    A_T = jnp.asarray(np.transpose(Ablk, (1, 2, 0)).reshape(t * t, N))
    Minv_T = jnp.asarray(np.transpose(Minv, (1, 2, 0)).reshape(t * t, N))
    C_T = jnp.transpose(jnp.asarray(C), (0, 2, 3, 1)).reshape(
        n_off * t * t, N)
    b_T = jnp.asarray(b.T)
    offs = tuple(sp.offsets)
    x_ref, it_ref = _cg_body(A_T, Minv_T, C_T, b_T, offs, t, 200, 1e-7)
    x_til, it_til = stencil_cg_tiled(b_T, A_T, Minv_T, C_T, offs, t, 200,
                                     1e-7, tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(x_til), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)
    assert abs(int(it_til) - int(it_ref)) <= 1


def test_pallas_nn1_matches_bruteforce():
    """Fused nearest-neighbor kernel (interpret mode) == dense argmin,
    including non-divisible shapes (ref and nbr padding)."""
    from pypose_tpu.ops.pallas_knn import nn1
    rng = np.random.default_rng(4)
    ref = jnp.asarray(rng.normal(size=(333, 3)), jnp.float32)
    nbr = jnp.asarray(rng.normal(size=(777, 3)), jnp.float32)
    d2, idx = nn1(ref, nbr, tr=64, tn=128, interpret=True)
    D = np.linalg.norm(np.asarray(ref)[:, None] - np.asarray(nbr)[None],
                       axis=-1)
    assert (np.asarray(idx) == D.argmin(1)).mean() > 0.999
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), D.min(1),
                               atol=1e-3)


def test_pallas_nnk_matches_bruteforce():
    """Running-top-k kernel (interpret mode) == dense sorted k-smallest,
    across multiple neighbor tiles and non-divisible padding."""
    from pypose_tpu.ops.pallas_knn import nnk
    rng = np.random.default_rng(7)
    ref = jnp.asarray(rng.normal(size=(150, 3)), jnp.float32)
    nbr = jnp.asarray(rng.normal(size=(333, 3)), jnp.float32)
    for k in (2, 4, 7):
        d2, idx = nnk(ref, nbr, k, tr=64, tn=128, interpret=True)
        D2 = ((np.asarray(ref)[:, None] - np.asarray(nbr)[None]) ** 2
              ).sum(-1)
        order = np.argsort(D2, axis=1)[:, :k]
        ref_d2 = np.take_along_axis(D2, order, axis=1)
        # values must match the true k smallest (ties make indices
        # ambiguous; compare distances, and indices where gaps are clear)
        np.testing.assert_allclose(np.asarray(d2), ref_d2,
                                   rtol=1e-4, atol=1e-5)
        gap = np.diff(ref_d2, axis=1) > 1e-4
        clear = np.concatenate([np.ones((len(ref), 1), bool), gap], 1)
        assert (np.asarray(idx) == order)[clear].mean() > 0.999


def test_pallas_nnk_k_exceeds_tile():
    """k at/above the neighbor tile size still merges correctly — the
    per-tile extraction pulls inf-filled slots (k=16 from tn=16 tiles,
    and from a mostly-padded final tile) which the running merge must
    never select (r4 advisor: the old k=16/tn=128 case exercised
    neither)."""
    from pypose_tpu.ops.pallas_knn import nnk
    rng = np.random.default_rng(9)
    ref = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
    nbr = jnp.asarray(rng.normal(size=(300, 3)), jnp.float32)
    D2 = ((np.asarray(ref)[:, None] - np.asarray(nbr)[None]) ** 2).sum(-1)
    ref_d2 = np.sort(D2, axis=1)[:, :16]
    for tn in (16, 32, 128):
        # tn=16: k == tile size, every tile's k-extraction exhausts the
        # tile; tn=128: last tile of 300 has 44 real + 84 padded rows,
        # so its extraction yields inf slots the merge must drop
        d2, idx = nnk(ref, nbr, 16, tr=40, tn=tn, interpret=True)
        np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-4,
                                   atol=1e-5, err_msg=f'tn={tn}')
        assert np.isfinite(np.asarray(d2)).all()
        assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 300).all()
