"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(xla_force_host_platform_device_count=8, set in conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pypose_tpu as pp
from pypose_tpu.parallel import (make_mesh, shard_leading, replicate,
                                 ShardedPGO, make_pgo_step)
from pypose_tpu.datasets import synthetic_sphere


requires_8 = pytest.mark.skipif(jax.device_count() < 8,
                                reason='needs 8 virtual devices')


@requires_8
def test_mesh_and_placement():
    mesh = make_mesh(8)
    x = jnp.arange(64.0).reshape(16, 4)
    xs = shard_leading(x, mesh)
    assert len(xs.sharding.device_set) == 8
    xr = replicate(x, mesh)
    assert xr.sharding.is_fully_replicated


@requires_8
def test_sharded_pgo_matches_single_device():
    ds = synthetic_sphere(n_poses=40, loops_per_pose=0.5, seed=5)
    mesh = make_mesh(8)
    opt = ShardedPGO(ds['nodes'], ds['edges'], ds['poses'], mesh=mesh,
                     cg_iter=30)
    chi0 = opt.step()
    chi1 = opt.step()
    assert chi1 < chi0

    # single-device functional step on unpadded data must agree
    step = jax.jit(make_pgo_step(40, damping=1e-4, cg_iter=30))
    nodes, c0 = step(ds['nodes'].tensor(), jnp.asarray(ds['edges']),
                     ds['poses'].tensor())
    np.testing.assert_allclose(chi0, float(c0), rtol=1e-4)
    nodes2, c1 = step(nodes, jnp.asarray(ds['edges']), ds['poses'].tensor())
    np.testing.assert_allclose(chi1, float(c1), rtol=1e-3, atol=1e-2)


@requires_8
def test_sharded_lie_ops():
    """Batched Lie ops sharded over devices produce identical results."""
    mesh = make_mesh(8)
    X = pp.randn_SE3(64, key=jax.random.PRNGKey(0))
    p = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    Xs = pp.SE3(shard_leading(X.tensor(), mesh))
    ps = shard_leading(p, mesh)

    @jax.jit
    def f(Xd, p):
        X = pp.SE3(Xd)
        return (X @ X.Inv() @ X).Act(p), X.Log().tensor()

    out_s, log_s = f(Xs.tensor(), ps)
    out_r, log_r = f(X.tensor(), p)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(log_s), np.asarray(log_r),
                               atol=1e-6)


@requires_8
def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, '/root/repo')
    import __graft_entry__ as g
    g.dryrun_multichip(8)
    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


@requires_8
def test_sharded_ba_matches_single_device():
    from pypose_tpu.parallel import ShardedBA, make_ba_step
    from pypose_tpu.datasets import synthetic_bal
    ds = synthetic_bal(n_cams=6, n_points=60, obs_per_point=3, seed=9)
    mesh = make_mesh(8)
    ba = ShardedBA(ds['poses'], ds['points'], ds['cam_idx'], ds['pt_idx'],
                   ds['pixels'], ds['cameras'], mesh=mesh, cg_iter=20)
    chi0 = ba.step()
    chi1 = ba.step()
    assert chi1 < chi0

    step = jax.jit(make_ba_step(6, 60, cg_iter=20))
    cams = jnp.asarray(ds['cameras'])[jnp.asarray(ds['cam_idx'])]
    poses, points, c0 = step(ds['poses'].tensor(), ds['points'],
                             jnp.asarray(ds['cam_idx']),
                             jnp.asarray(ds['pt_idx']),
                             jnp.asarray(ds['pixels']), cams)
    np.testing.assert_allclose(chi0, float(c0), rtol=1e-4)
    _, _, c1 = step(poses, points, jnp.asarray(ds['cam_idx']),
                    jnp.asarray(ds['pt_idx']), jnp.asarray(ds['pixels']),
                    cams)
    np.testing.assert_allclose(chi1, float(c1), rtol=1e-3, atol=1e-2)


def test_sharded_run_matches_steps():
    # run(steps) == N x step(), one compiled program on the mesh
    from pypose_tpu.parallel import ShardedPGO, make_mesh
    from pypose_tpu.datasets import synthetic_sphere
    ds = synthetic_sphere(60, seed=3)
    mesh = make_mesh()
    a = ShardedPGO(ds['nodes'], ds['edges'], ds['poses'], mesh=mesh)
    b = ShardedPGO(ds['nodes'], ds['edges'], ds['poses'], mesh=mesh)
    for _ in range(4):
        la = a.step()
    lb = b.run(4)
    assert len(b.history) == 4
    # two separately compiled programs: f32 fusion order differs
    assert abs(la - lb) / max(abs(la), 1e-12) < 1e-2, (la, lb)
    assert jnp.allclose(a.nodes, b.nodes, atol=1e-2, rtol=0)


def test_sharded_ba_run():
    from pypose_tpu.parallel import ShardedBA, make_mesh
    from pypose_tpu.datasets import synthetic_bal
    ds = synthetic_bal(n_cams=8, n_points=100, seed=6)
    mesh = make_mesh()
    ba = ShardedBA(ds['poses'], ds['points'], ds['cam_idx'], ds['pt_idx'],
                   ds['pixels'], ds['cameras'], mesh=mesh)
    c0 = ba.step()
    c1 = ba.run(3)
    assert c1 <= c0 * 1.01
    assert len(ba.history) == 3
