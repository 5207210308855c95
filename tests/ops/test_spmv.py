"""CouplingSpMV vs explicitly assembled dense normal equations."""

import numpy as np
import pytest

import jax.numpy as jnp

from pypose_tpu.ops.spmv import CouplingSpMV


def make_problem(N=37, E_chain=20, E_loop=25, d=6, t=6, seed=0,
                 weighted=True):
    rng = np.random.default_rng(seed)
    chain_i = np.arange(3, 3 + E_chain)
    chain = np.stack([chain_i, chain_i + 1], 1)
    li = rng.integers(0, N, E_loop)
    lj = (li + rng.integers(2, N - 2, E_loop)) % N
    keep = li != lj
    loops = np.stack([li[keep], lj[keep]], 1)
    edges = np.concatenate([chain, loops], 0)
    E = edges.shape[0]
    J = rng.normal(size=(E, d, 2, t)).astype(np.float32)
    if weighted:
        w = rng.normal(size=(E, d, d)).astype(np.float32)
        W = np.einsum('eij,ekj->eik', w, w) + 3 * np.eye(d, dtype=np.float32)
    else:
        W = np.broadcast_to(np.eye(d, dtype=np.float32), (E, d, d))
    WJ = np.einsum('eij,ejat->eiat', W, J).astype(np.float32)
    return edges, J, WJ, E


def dense_A(edges, J, WJ, N, t):
    E, d = J.shape[:2]
    A = np.zeros((N * t, N * t), np.float64)
    for e in range(E):
        i, j = edges[e]
        Jf = np.zeros((d, N * t))
        Jf[:, i * t:(i + 1) * t] = J[e, :, 0, :]
        Jf[:, j * t:(j + 1) * t] = J[e, :, 1, :]
        WJf = np.zeros((d, N * t))
        WJf[:, i * t:(i + 1) * t] = WJ[e, :, 0, :]
        WJf[:, j * t:(j + 1) * t] = WJ[e, :, 1, :]
        A += Jf.T @ WJf
    return A


@pytest.mark.parametrize('weighted', [False, True])
def test_coupling_matvec_matches_dense(weighted):
    N, t = 37, 6
    edges, J, WJ, E = make_problem(N=N, weighted=weighted)
    A = dense_A(edges, J, WJ, N, t)

    sp = CouplingSpMV(edges, N, t)
    Jj = jnp.asarray(J)
    WJj = jnp.asarray(WJ)
    state = sp.precompute(Jj, WJj)
    # diagonal blocks from the same accumulation SparseLM uses
    D = np.zeros((N, t, t), np.float32)
    for e in range(E):
        i, j = edges[e]
        D[i] += WJ[e, :, 0, :].T @ J[e, :, 0, :]
        D[j] += WJ[e, :, 1, :].T @ J[e, :, 1, :]

    rng = np.random.default_rng(1)
    x = rng.normal(size=(N, t)).astype(np.float32)
    y = np.asarray(sp.matvec(state, jnp.asarray(D), jnp.asarray(x)))
    y_ref = (A @ x.reshape(-1).astype(np.float64)).reshape(N, t)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-3)


def test_coupling_matvec_chain_only():
    N, t = 20, 6
    edges = np.stack([np.arange(N - 1), np.arange(1, N)], 1)
    rng = np.random.default_rng(2)
    J = rng.normal(size=(N - 1, 6, 2, t)).astype(np.float32)
    W = np.broadcast_to(np.eye(6, dtype=np.float32), (N - 1, 6, 6))
    WJ = np.einsum('eij,ejat->eiat', W, J).astype(np.float32)
    A = dense_A(edges, J, WJ, N, t)
    sp = CouplingSpMV(edges, N, t)
    assert sp._chain_contig and len(sp.loop_rows) == 0
    state = sp.precompute(jnp.asarray(J), jnp.asarray(WJ))
    D = np.zeros((N, t, t), np.float32)
    for e in range(N - 1):
        i, j = edges[e]
        D[i] += WJ[e, :, 0, :].T @ J[e, :, 0, :]
        D[j] += WJ[e, :, 1, :].T @ J[e, :, 1, :]
    x = rng.normal(size=(N, t)).astype(np.float32)
    y = np.asarray(sp.matvec(state, jnp.asarray(D), jnp.asarray(x)))
    y_ref = (A @ x.reshape(-1).astype(np.float64)).reshape(N, t)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-3)


def test_coupling_matvec_noncontiguous_chain():
    """Short j==i+1 runs with gaps go through the general one-hot path."""
    N, t = 30, 6
    edges = np.array([[0, 1], [5, 6], [10, 11], [2, 17], [20, 3]])
    rng = np.random.default_rng(3)
    E = edges.shape[0]
    J = rng.normal(size=(E, 6, 2, t)).astype(np.float32)
    W = np.broadcast_to(np.eye(6, dtype=np.float32), (E, 6, 6))
    WJ = np.einsum('eij,ejat->eiat', W, J).astype(np.float32)
    A = dense_A(edges, J, WJ, N, t)
    sp = CouplingSpMV(edges, N, t)
    assert not sp._chain_contig
    state = sp.precompute(jnp.asarray(J), jnp.asarray(WJ))
    D = np.zeros((N, t, t), np.float32)
    for e in range(E):
        i, j = edges[e]
        D[i] += WJ[e, :, 0, :].T @ J[e, :, 0, :]
        D[j] += WJ[e, :, 1, :].T @ J[e, :, 1, :]
    x = rng.normal(size=(N, t)).astype(np.float32)
    y = np.asarray(sp.matvec(state, jnp.asarray(D), jnp.asarray(x)))
    y_ref = (A @ x.reshape(-1).astype(np.float64)).reshape(N, t)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-3)


@pytest.mark.slow
def test_sparselm_coupling_matches_generic():
    """SparseLM's coupling-block matvec path reproduces the generic
    gather/scatter path: identical LM trajectories on a weighted,
    kernelized pose graph.  (Slow tier: compiles TWO whole-loop LM
    programs, ~33 s cold on the single-CPU gate box.)"""
    import jax.numpy as jnp
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import SparseLM, pgo_factor
    from pypose_tpu.optim.strategy import TrustRegion
    from pypose_tpu.optim.kernel import Huber

    ds = synthetic_sphere(48, loops_per_pose=0.5, seed=11, info='natural')
    fixed = {'poses': jnp.zeros(48, bool).at[0].set(True)}

    def mk(mv):
        return SparseLM(
            {'poses': ds['nodes']},
            [pgo_factor(ds['edges'], ds['poses'], ds['infos'],
                        Huber(delta=1.0))],
            strategy=TrustRegion(radius=1e4), fixed=fixed,
            cg_iter=60, cg_tol=1e-6, matvec=mv)

    a, b = mk('coupling'), mk('generic')
    assert a._spmv is not None and b._spmv is None
    ta = [a.step() for _ in range(4)]
    tb = [b.step() for _ in range(4)]
    np.testing.assert_allclose(ta, tb, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(a.params['poses'].tensor()),
        np.asarray(b.params['poses'].tensor()), atol=2e-3)


def test_stencil_matvec_matches_dense():
    """StencilSpMV (circulant offset channels) vs dense assembly,
    including duplicate (i, offset) edges and wrap-around offsets."""
    from pypose_tpu.ops.spmv import StencilSpMV
    N, t = 40, 6
    rng = np.random.default_rng(4)
    chain = np.stack([np.arange(N - 1), np.arange(1, N)], 1)
    li = rng.integers(0, N, 18)
    loops = np.stack([li, (li + 13) % N], 1)     # one circular offset
    back = np.stack([[7, 30], [7, 30]])[0:1]     # offset (30-7)=23
    edges = np.concatenate([chain, loops, loops[:3], back], 0)  # dups!
    E = edges.shape[0]
    J = rng.normal(size=(E, 6, 2, t)).astype(np.float32)
    W = np.broadcast_to(np.eye(6, dtype=np.float32), (E, 6, 6))
    WJ = np.einsum('eij,ejat->eiat', W, J).astype(np.float32)
    A = dense_A(edges, J, WJ, N, t)
    sp = StencilSpMV(edges, N, t)
    assert len(sp.offsets) == 3
    C = sp.precompute(jnp.asarray(J), jnp.asarray(WJ))
    D = np.zeros((N, t, t), np.float32)
    for e in range(E):
        i, j = edges[e]
        D[i] += WJ[e, :, 0, :].T @ J[e, :, 0, :]
        D[j] += WJ[e, :, 1, :].T @ J[e, :, 1, :]
    x = rng.normal(size=(N, t)).astype(np.float32)
    y = np.asarray(sp.matvec(C, jnp.asarray(D), jnp.asarray(x)))
    y_ref = (A @ x.reshape(-1).astype(np.float64)).reshape(N, t)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-3)


def test_stencil_refuses_scattered_graphs():
    from pypose_tpu.ops.spmv import StencilSpMV
    rng = np.random.default_rng(5)
    edges = rng.integers(0, 500, size=(40, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    with pytest.raises(ValueError):
        StencilSpMV(edges, 500, 6)


def test_sparselm_picks_stencil_for_sphere():
    """Construction-time check only (the stepping variant below is slow
    tier: one whole-loop LM compile is ~25 s cold on the gate box)."""
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import SparseLM, pgo_factor
    from pypose_tpu.ops.spmv import StencilSpMV
    ds = synthetic_sphere(64, seed=2)
    opt = SparseLM({'poses': ds['nodes']},
                   [pgo_factor(ds['edges'], ds['poses'])],
                   fixed={'poses': jnp.zeros(64, bool).at[0].set(True)},
                   cg_iter=40)
    assert all(isinstance(s, StencilSpMV) for s in opt._spmv)
    assert opt._stencil_all is not None


@pytest.mark.slow
def test_sparselm_stencil_steps_decrease():
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import SparseLM, pgo_factor
    ds = synthetic_sphere(64, seed=2)
    opt = SparseLM({'poses': ds['nodes']},
                   [pgo_factor(ds['edges'], ds['poses'])],
                   fixed={'poses': jnp.zeros(64, bool).at[0].set(True)},
                   cg_iter=40)
    l0 = opt.step()
    l1 = opt.step()
    assert l1 < l0
