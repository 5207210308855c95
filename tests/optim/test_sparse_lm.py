"""Sparse factor-graph LM tests: synthetic PGO convergence, equivalence of
the matvec normal equations with explicit dense assembly, mixed variable
groups (BA-style), robust kernels, and gauge fixing.

Replaces the reference's skip-on-missing-CUDA-backend strategy
(tests/optim/test_sparse_lm.py:44-70) with a fully native implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pypose_tpu as pp
from pypose_tpu.optim.sparse import SparseLM, Factor, pgo, pgo_factor
from pypose_tpu.optim.strategy import TrustRegion
from pypose_tpu.optim.kernel import Huber
from pypose_tpu.datasets import synthetic_sphere


def circle_graph(N=60, loops=10, meas_sigma=0.01, init_sigma=0.3, seed=0):
    t = jnp.linspace(0, 2 * jnp.pi, N, endpoint=False)
    xyz = jnp.stack([10 * jnp.cos(t), 10 * jnp.sin(t),
                     jnp.zeros_like(t)], -1)
    rpy = jnp.stack([jnp.zeros_like(t), jnp.zeros_like(t),
                     t + jnp.pi / 2], -1)
    gt = pp.SE3(jnp.concatenate([xyz, pp.euler2SO3(rpy).tensor()], -1))
    ii = jnp.arange(N)
    jj = (ii + 1) % N
    li = jax.random.randint(jax.random.PRNGKey(seed + 1), (loops,), 0, N)
    lj = (li + N // 2) % N
    ii, jj = jnp.concatenate([ii, li]), jnp.concatenate([jj, lj])
    E = ii.shape[0]
    Z = (gt[ii].Inv() @ gt[jj]) @ pp.randn_SE3(
        E, sigma=meas_sigma, key=jax.random.PRNGKey(seed + 2))
    init = pp.randn_SE3(N, sigma=init_sigma,
                        key=jax.random.PRNGKey(seed + 3)) @ gt
    init = pp.SE3(init.tensor().at[0].set(gt.tensor()[0]))
    edges = jnp.stack([ii, jj], -1)
    return gt, init, edges, Z


def test_pgo_converges():
    gt, init, edges, Z = circle_graph()
    opt_nodes, hist = pgo(init, edges, Z, steps=15, cg_iter=100,
                          cg_tol=1e-6)
    assert hist[-1] < 0.05 * hist[0]
    err = (opt_nodes.Inv() @ gt).Log().tensor()
    assert float(jnp.abs(err).mean()) < 0.1


def test_pgo_with_infos_and_kernel():
    gt, init, edges, Z = circle_graph(N=40, loops=6)
    infos = jnp.broadcast_to(2.0 * jnp.eye(6), (edges.shape[0], 6, 6))
    nodes, hist = pgo(init, edges, Z, infos=infos, kernel=Huber(delta=5.0),
                      steps=12, cg_iter=100, cg_tol=1e-6)
    assert hist[-1] < 0.05 * hist[0]


def test_matvec_matches_dense():
    """J^T W J x via gather/scatter == dense assembly."""
    gt, init, edges, Z = circle_graph(N=12, loops=3)
    E = edges.shape[0]
    infos = jnp.broadcast_to(1.5 * jnp.eye(6), (E, 6, 6))
    factor = pgo_factor(edges, Z, infos)
    opt = SparseLM({'poses': init}, [factor])
    fdata = opt._factor_data()
    blocks = [opt._weighted(factor, fdata[0],
                            *opt._edge_r_jac(opt.params, factor, fdata[0]))]
    r, J, WR, WJ = blocks[0]
    N = init.lshape[0]
    # dense J [6E, 6N]
    Jd = np.zeros((6 * E, 6 * N))
    Jnp = np.asarray(J['poses'])
    for e in range(E):
        for a in range(2):
            n = int(edges[e, a])
            Jd[6 * e:6 * e + 6, 6 * n:6 * n + 6] = Jnp[e, :, a, :]
    W = np.kron(np.eye(E), 1.5 * np.eye(6))
    A = Jd.T @ W @ Jd
    x = np.random.default_rng(0).normal(size=(N, 6)).astype(np.float32)
    y_sparse = np.asarray(opt._matvec(blocks, fdata,
                                      {'poses': jnp.asarray(x)})['poses'])
    y_dense = (A @ x.reshape(-1)).reshape(N, 6)
    np.testing.assert_allclose(y_sparse, y_dense, rtol=2e-3, atol=1e-3)
    # rhs
    b_sparse = np.asarray(opt._rhs(blocks, fdata)['poses'])
    b_dense = (-Jd.T @ W @ np.asarray(r).reshape(-1)).reshape(N, 6)
    np.testing.assert_allclose(b_sparse, b_dense, rtol=2e-3, atol=1e-3)
    # diag
    d_sparse = np.asarray(opt._diag(blocks, fdata)['poses'])
    np.testing.assert_allclose(d_sparse,
                               np.diagonal(A).reshape(N, 6),
                               rtol=2e-3, atol=1e-3)


def test_gauge_fixing():
    gt, init, edges, Z = circle_graph(N=30, loops=5)
    anchor = gt.tensor()[0]
    nodes, _ = pgo(init, edges, Z, steps=10, fix_first=True)
    np.testing.assert_allclose(np.asarray(nodes.tensor()[0]),
                               np.asarray(anchor), atol=1e-6)


def test_mixed_groups_ba_style():
    """Tiny bundle-adjustment-style problem: poses + 3D points, observed
    directions; both groups must update."""
    key = jax.random.PRNGKey(0)
    C, P = 4, 10
    gt_pose = pp.randn_SE3(C, sigma=0.2, key=jax.random.PRNGKey(1))
    gt_pts = jax.random.normal(jax.random.PRNGKey(2), (P, 3)) + \
        jnp.array([0., 0., 5.])
    ci, pi = jnp.meshgrid(jnp.arange(C), jnp.arange(P), indexing='ij')
    ci, pi = ci.reshape(-1), pi.reshape(-1)
    obs = gt_pose[ci].Act(gt_pts[pi])  # 3D observations in camera frame

    def resid(values, obs):
        X = values['poses'][0]
        pt = values['points'][0]
        return X.Act(pt) - obs

    factor = Factor(resid, indices={'poses': ci[:, None],
                                    'points': pi[:, None]}, consts=obs)
    init_pose = pp.randn_se3(C, sigma=0.05,
                             key=jax.random.PRNGKey(3)).Exp() @ gt_pose
    init_pts = gt_pts + 0.1 * jax.random.normal(jax.random.PRNGKey(4),
                                                (P, 3))
    fixed = {'poses': jnp.zeros(C, bool).at[0].set(True),
             'points': jnp.zeros(P, bool)}
    opt = SparseLM({'poses': init_pose, 'points': init_pts}, [factor],
                   fixed=fixed, cg_iter=200, cg_tol=1e-7)
    for _ in range(10):
        loss = opt.step()
    assert loss < 1e-6


def test_chain_split_equivalence():
    """pgo with odometry chain splitting (slice path) matches monolithic."""
    from pypose_tpu.optim.sparse import split_chain_edges
    from pypose_tpu.datasets import synthetic_sphere
    ds = synthetic_sphere(120, seed=7)
    runs, rest = split_chain_edges(ds['edges'])
    assert len(runs) == 1 and len(runs[0]) == 119
    n1, h1 = pgo(ds['nodes'], ds['edges'], ds['poses'], steps=5,
                 cg_iter=80, cg_tol=1e-7, split_chains=True)
    n2, h2 = pgo(ds['nodes'], ds['edges'], ds['poses'], steps=5,
                 cg_iter=80, cg_tol=1e-7, split_chains=False)
    # split path also upgrades CG to the chain-exact (BCR) preconditioner:
    # inexact solves differ slightly (and converge at least as low)
    np.testing.assert_allclose(h1[-1], h2[-1], rtol=2e-2)
    assert float(jnp.abs(n1.tensor() - n2.tensor()).max()) < 5e-2


def test_jitted_optimize():
    """Device-side optimize() matches step()-loop results."""
    gt, init, edges, Z = circle_graph(N=40, loops=6, seed=4)
    opt = SparseLM({'poses': init}, [pgo_factor(edges, Z)],
                   fixed={'poses': jnp.zeros(40, bool).at[0].set(True)},
                   cg_iter=60, cg_tol=1e-7)
    loss = opt.optimize(steps=8, decreasing=1e-9)
    assert loss < 0.05 * opt.history[0]
    assert len(opt.history) <= 8


def test_chain_preconditioner():
    """Chain-dominated graph: the BCR preconditioner converges faster and
    to the same solution as block-Jacobi."""
    from pypose_tpu.optim.sparse import split_chain_edges
    from pypose_tpu.datasets import synthetic_sphere
    ds = synthetic_sphere(300, loops_per_pose=0.05, seed=11)
    edges = jnp.asarray(ds['edges'])
    runs, rest = split_chain_edges(edges)
    fixed = {'poses': jnp.zeros(300, bool).at[0].set(True)}
    factors = [pgo_factor(edges[jnp.asarray(r)], ds['poses'][jnp.asarray(r)])
               for r in runs]
    if len(rest):
        factors.append(pgo_factor(edges[jnp.asarray(rest)],
                                  ds['poses'][jnp.asarray(rest)]))
    # auto should select chain here
    opt = SparseLM({'poses': ds['nodes']}, factors, fixed=fixed,
                   cg_iter=120, cg_tol=1e-7)
    assert opt.precond == 'chain'
    for _ in range(8):
        loss_chain = opt.step()
    opt2 = SparseLM({'poses': ds['nodes']}, factors, fixed=fixed,
                    cg_iter=120, cg_tol=1e-7, precond='jacobi')
    for _ in range(8):
        loss_jac = opt2.step()
    assert loss_chain <= loss_jac * 1.5
    assert loss_chain < 0.05 * 100  # converged sanity


def test_sim3_chain_jacrev_fallback():
    """SparseLM is group-generic: a Sim3 chain graph through a raw
    user-written ``Factor`` (no closed-form Jacobian attached — exercises
    the jacrev fallback path) converges."""
    N = 30
    gt = pp.randn_Sim3(N, sigma=(0.6, 0.2, 0.1), key=jax.random.PRNGKey(21))
    ii = jnp.arange(N - 1)
    jj = ii + 1
    edges = jnp.stack([ii, jj], -1)
    Z = gt[ii].Inv() @ gt[jj]

    def resid(values, Z):
        Xi, Xj = values['poses'][0], values['poses'][1]
        return (Z.Inv() @ (Xi.Inv() @ Xj)).Log().tensor()

    factor = Factor(resid, indices={'poses': edges}, consts=Z)
    init = pp.randn_Sim3(N, sigma=(0.1, 0.05, 0.02),
                         key=jax.random.PRNGKey(22)) @ gt
    init = pp.Sim3(init.tensor().at[0].set(gt.tensor()[0]))
    fixed = {'poses': jnp.zeros(N, bool).at[0].set(True)}
    opt = SparseLM({'poses': init}, [factor], fixed=fixed, cg_iter=100,
                   cg_tol=1e-7)
    for _ in range(10):
        loss = opt.step()
    assert loss < 1e-6
    err = (opt.params['poses'].Inv() @ gt).Log().tensor()
    assert float(jnp.abs(err).mean()) < 1e-3


def test_sim3_pose_graph():
    """Sim3 pose-graph optimization (scale-drift SLAM): pgo_factor is
    group-generic — it attaches closed-form tangent Jacobians for all
    four group families, Sim3 included — and the whole SparseLM stack
    (tangent dim 7, retraction, CG) follows the ltype.  Capability
    beyond the reference's SE3-only pgo example."""
    import pypose_tpu as pp
    N = 40
    truth = pp.randn_Sim3(N, sigma=(0.3, 0.2, 0.1),
                          key=jax.random.PRNGKey(0))
    ii = jnp.arange(N - 1)
    edges = jnp.concatenate([jnp.stack([ii, ii + 1], 1),
                             jnp.array([[N - 1, 0], [N // 2, 0]])], 0)
    Z = truth[edges[:, 0]].Inv() @ truth[edges[:, 1]]
    noisy = truth @ pp.randn_Sim3(N, sigma=(0.1, 0.05, 0.05),
                                  key=jax.random.PRNGKey(1))
    opt = SparseLM({'poses': noisy}, [pgo_factor(edges, Z)],
                   strategy=TrustRegion(radius=1e4),
                   fixed={'poses': jnp.zeros(N, bool).at[0].set(True)},
                   cg_iter=200, cg_tol=1e-10)
    final = opt.optimize(steps=12, decreasing=1e-10, patience=3)
    assert final < opt.history[0] * 1e-6
    # the residual is invariant under a global LEFT transform; the fixed
    # node pins it, so X == G @ truth with G = X_0 truth_0^-1
    X = opt.params['poses']
    G = X[0] @ truth[0].Inv()
    err = ((G.Inv() @ X).Inv() @ truth).Log().tensor()
    assert float(jnp.abs(err).max()) < 1e-3


def test_so3_rotation_averaging():
    """SO3 synchronization (rotation averaging) — the third group family
    through the same generic pgo_factor/SparseLM machinery (tangent dim
    3, jacrev fallback)."""
    import pypose_tpu as pp
    N = 50
    truth = pp.randn_SO3(N, key=jax.random.PRNGKey(0))
    ii = jnp.arange(N - 1)
    edges = jnp.concatenate([jnp.stack([ii, ii + 1], 1),
                             jnp.array([[N - 1, 0], [10, 30], [5, 45]])], 0)
    Z = truth[edges[:, 0]].Inv() @ truth[edges[:, 1]]
    noisy = truth @ pp.randn_SO3(N, sigma=0.1, key=jax.random.PRNGKey(1))
    opt = SparseLM({'rot': noisy}, [pgo_factor(edges, Z, name='rot')],
                   strategy=TrustRegion(radius=1e4),
                   fixed={'rot': jnp.zeros(N, bool).at[0].set(True)},
                   cg_iter=100, cg_tol=1e-10)
    final = opt.optimize(steps=10, decreasing=1e-10, patience=3)
    assert final < opt.history[0] * 1e-6
    X = opt.params['rot']
    G = X[0] @ truth[0].Inv()
    err = ((G.Inv() @ X).Inv() @ truth).Log().tensor()
    assert float(jnp.abs(err).max()) < 1e-3
