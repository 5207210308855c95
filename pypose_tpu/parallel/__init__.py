r"""Multi-chip scale-out via jax.sharding / GSPMD.

The reference has no distributed machinery (SURVEY §2.8: no
torch.distributed anywhere); this module is the *new* first-class
distributed dimension of the TPU build: factor-graph edges (the dominant
axis in PGO/BA) and Lie-op batches shard over a device mesh, with XLA
inserting the collectives (the scatter-add of J^T r across edge shards
becomes a psum over ICI).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lietensor.lietensor import LieTensor
from ..lietensor.utils import SE3
from ..optim.sparse import SparseLM, Factor, pgo_factor
from ..optim.strategy import TrustRegion

__all__ = ['make_mesh', 'shard_leading', 'replicate', 'ShardedPGO',
           'make_pgo_step', 'make_ba_step', 'ShardedBA']


def make_mesh(n_devices=None, axis='dp', devices=None):
    """1-D device mesh over the first n devices."""
    devices = jax.devices() if devices is None else devices
    n = len(devices) if n_devices is None else n_devices
    return Mesh(np.asarray(devices[:n]), (axis,))


def shard_leading(tree, mesh, axis='dp'):
    """Place every leaf with its leading dim sharded over ``axis``."""
    def put(x):
        spec = P(axis, *([None] * (jnp.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh):
    """Replicate every leaf across the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)


def make_pgo_step(n_nodes, damping=1e-4, cg_iter=50, cg_tol=1e-6):
    r"""Build a pure, shardable PGO LM step:

        step(nodes_data, edges, Z_data) -> (new_nodes_data, chi2)

    All inputs are raw arrays (SE3 storage), so the function jits cleanly
    with edge-dim shardings; gathers/scatter-adds across edge shards lower
    to XLA collectives.  This is the multi-chip training-step used by
    the driver's dryrun and by ShardedPGO.
    """

    def residual(Xi, Xj, Z):
        return (Z.Inv() @ (Xi.Inv() @ Xj)).Log().tensor()

    def edge_r_jac(nodes_data, edges, Z_data):
        # closed-form left-perturbation Jacobians: with M = Z^-1 Xi^-1 and
        # r = Log(M Xj): J_j = Jl^-1(r) Adj(M), J_i = -J_j
        from ..lietensor.jacobian import se3_Jl_inv
        from ..lietensor.operation import SE3_Adj
        Xi = SE3(nodes_data[edges[:, 0]])
        Xj = SE3(nodes_data[edges[:, 1]])
        Z = SE3(Z_data)
        M = Z.Inv() @ Xi.Inv()
        r = (M @ Xj).Log().tensor()
        Jj = jnp.matmul(se3_Jl_inv(r), SE3_Adj(M.tensor()), precision=_HI)
        J = jnp.stack([-Jj, Jj], axis=2)
        return r, J  # r [E, 6]; J [E, 6, 2, 6]

    def step(nodes_data, edges, Z_data):
        N = n_nodes
        r, J = edge_r_jac(nodes_data, edges, Z_data)
        chi2 = jnp.sum(r * r)
        idx = edges.reshape(-1)

        # rhs, gauge-fix node 0
        contrib = jnp.einsum('edat,ed->eat', J, r, precision=_HI)
        b = -jnp.zeros((N, 6), dtype=r.dtype).at[idx].add(
            contrib.reshape(-1, 6))
        b = b.at[0].set(0.0)

        diag = jnp.zeros((N, 6), dtype=r.dtype).at[idx].add(
            jnp.sum(J * J, axis=1).reshape(-1, 6))
        diag = jnp.clip(diag, 1e-6, 1e32)

        def Avp(x):
            x = x.at[0].set(0.0)
            xg = x[edges]
            Jx = jnp.einsum('edat,eat->ed', J, xg, precision=_HI)
            contrib = jnp.einsum('edat,ed->eat', J, Jx, precision=_HI)
            y = jnp.zeros((N, 6), dtype=x.dtype).at[idx].add(
                contrib.reshape(-1, 6))
            y = y + damping * diag * x
            return y.at[0].set(0.0)

        Minv = 1.0 / ((1.0 + damping) * diag)
        delta, _ = jax.scipy.sparse.linalg.cg(
            Avp, b, tol=cg_tol, maxiter=cg_iter, M=lambda x: Minv * x)
        delta = delta.at[0].set(0.0)
        new_nodes = SE3(nodes_data).add(delta).tensor()
        return new_nodes, chi2

    return step


def make_ba_step(n_cams, n_points, damping=1e-4, cg_iter=30, cg_tol=1e-6):
    r"""Pure, shardable Schur-complement BA step:

        step(poses_data, points, cam_idx, pt_idx, pixels, cameras)
            -> (new_poses_data, new_points, chi2)

    Observations (the dominant axis) shard over the mesh; the per-obs
    JᵀJ-block reductions lower to psums; the reduced camera system is tiny
    and solves replicated.
    """
    from ..optim.ba import reproj_residual_bal
    from ..ops.smallinv import inv3x3, inv6x6

    def step(poses_data, points, cam_idx, pt_idx, pixels, cameras):
        C, P = n_cams, n_points

        def one(tc, xp, cam, pix):
            def f(ec, ep):
                return reproj_residual_bal(SE3(tc).add(ec), xp + ep, cam,
                                           pix)
            z6 = jnp.zeros(6, poses_data.dtype)
            z3 = jnp.zeros(3, poses_data.dtype)
            r = f(z6, z3)
            Jc, Jp = jax.jacrev(f, argnums=(0, 1))(z6, z3)
            return r, Jc, Jp

        r, Jc, Jp = jax.vmap(one)(poses_data[cam_idx], points[pt_idx],
                                  cameras, pixels)
        chi2 = jnp.sum(r * r)
        bc = -jnp.zeros((C, 6), r.dtype).at[cam_idx].add(
            jnp.einsum('oda,od->oa', Jc, r, precision=_HI))
        bp = -jnp.zeros((P, 3), r.dtype).at[pt_idx].add(
            jnp.einsum('oda,od->oa', Jp, r, precision=_HI))
        bc = bc.at[0].set(0.0)
        Hcc = jnp.zeros((C, 6, 6), r.dtype).at[cam_idx].add(
            jnp.einsum('oda,odb->oab', Jc, Jc, precision=_HI))
        Hpp = jnp.zeros((P, 3, 3), r.dtype).at[pt_idx].add(
            jnp.einsum('oda,odb->oab', Jp, Jp, precision=_HI))

        def damped(H):
            d = jnp.clip(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-6, 1e32) \
                * (1.0 + damping)
            eye = jnp.eye(H.shape[-1], dtype=H.dtype)
            return H + (d - jnp.diagonal(H, axis1=-2, axis2=-1))[..., None] \
                * eye

        Hcc_d, Hpp_d = damped(Hcc), damped(Hpp)
        Hpp_inv = inv3x3(Hpp_d)
        y = jnp.einsum('pab,pb->pa', Hpp_inv, bp, precision=_HI)
        JpY = jnp.einsum('oda,oa->od', Jp, y[pt_idx], precision=_HI)
        bs = bc - jnp.zeros((C, 6), r.dtype).at[cam_idx].add(
            jnp.einsum('oda,od->oa', Jc, JpY, precision=_HI))
        bs = bs.at[0].set(0.0)

        def Svp(x):
            x = x.at[0].set(0.0)
            hx = jnp.einsum('cab,cb->ca', Hcc_d, x, precision=_HI)
            Jcx = jnp.einsum('oda,oa->od', Jc, x[cam_idx], precision=_HI)
            w = jnp.zeros((P, 3), x.dtype).at[pt_idx].add(
                jnp.einsum('oda,od->oa', Jp, Jcx, precision=_HI))
            w = jnp.einsum('pab,pb->pa', Hpp_inv, w, precision=_HI)
            JpW = jnp.einsum('oda,oa->od', Jp, w[pt_idx], precision=_HI)
            hx = hx - jnp.zeros((C, 6), x.dtype).at[cam_idx].add(
                jnp.einsum('oda,od->oa', Jc, JpW, precision=_HI))
            return hx.at[0].set(0.0)

        Minv = inv6x6(Hcc_d)
        dc, _ = jax.scipy.sparse.linalg.cg(
            Svp, bs, tol=cg_tol, maxiter=cg_iter,
            M=lambda x: jnp.einsum('cab,cb->ca', Minv, x, precision=_HI))
        dc = dc.at[0].set(0.0)
        Jcdc = jnp.einsum('oda,oa->od', Jc, dc[cam_idx], precision=_HI)
        Hpcdc = jnp.zeros((P, 3), r.dtype).at[pt_idx].add(
            jnp.einsum('oda,od->oa', Jp, Jcdc, precision=_HI))
        dp = jnp.einsum('pab,pb->pa', Hpp_inv, bp - Hpcdc, precision=_HI)
        return SE3(poses_data).add(dc).tensor(), points + dp, chi2

    return step


class ShardedBA:
    """Bundle adjustment with observations sharded over a device mesh."""

    def __init__(self, poses, points, cam_idx, pt_idx, pixels, cameras,
                 mesh=None, axis='dp', damping=1e-4, cg_iter=30,
                 cg_tol=1e-6):
        self.mesh = make_mesh() if mesh is None else mesh
        C, Pn = poses.lshape[0], points.shape[0]
        self._step_args = (C, Pn, damping, cg_iter, cg_tol)
        self._step = jax.jit(make_ba_step(C, Pn, damping, cg_iter, cg_tol))
        cameras = jnp.asarray(cameras)
        if cameras.shape[0] == C:
            cameras = cameras[jnp.asarray(cam_idx)]
        # pad observations to a mesh multiple with zero-focal fake cameras:
        # residual = f*dist*p - pix = 0 and every Jacobian term scales by
        # f = 0, so padded observations contribute exactly nothing.
        O = pixels.shape[0]
        m = self.mesh.shape[axis]
        pad = (-O) % m
        cam_idx = jnp.asarray(cam_idx, jnp.int32)
        pt_idx = jnp.asarray(pt_idx, jnp.int32)
        pixels = jnp.asarray(pixels)
        if pad:
            cam_idx = jnp.concatenate(
                [cam_idx, jnp.zeros(pad, jnp.int32)])
            pt_idx = jnp.concatenate([pt_idx, jnp.zeros(pad, jnp.int32)])
            pixels = jnp.concatenate(
                [pixels, jnp.zeros((pad, 2), pixels.dtype)])
            cameras = jnp.concatenate(
                [cameras, jnp.zeros((pad,) + cameras.shape[1:],
                                    cameras.dtype)])
        self.poses = replicate(poses.tensor(), self.mesh)
        self.points = replicate(points, self.mesh)
        self.cam_idx = shard_leading(cam_idx, self.mesh, axis)
        self.pt_idx = shard_leading(pt_idx, self.mesh, axis)
        self.pixels = shard_leading(pixels, self.mesh, axis)
        self.cameras = shard_leading(cameras, self.mesh, axis)

    def step(self):
        self.poses, self.points, chi2 = self._step(
            self.poses, self.points, self.cam_idx, self.pt_idx,
            self.pixels, self.cameras)
        return float(chi2)

    def run(self, steps):
        """``steps`` sharded LM iterations as ONE compiled program (a
        ``lax.fori_loop`` around the step body): a single dispatch + host
        sync for the whole optimization.  Returns per-step chi2 history."""
        if not hasattr(self, '_run_cache'):
            self._run_cache = {}
        if steps not in self._run_cache:
            body = make_ba_step(*self._step_args)

            def run(T, X, ci, pi, pix, cams):
                hist0 = jnp.zeros((steps,), jnp.float32)

                def f(i, st):
                    T, X, hist = st
                    T, X, chi2 = body(T, X, ci, pi, pix, cams)
                    return (T, X, hist.at[i].set(chi2.astype(jnp.float32)))

                return jax.lax.fori_loop(0, steps, f, (T, X, hist0))

            self._run_cache[steps] = jax.jit(run)
        self.poses, self.points, hist = self._run_cache[steps](
            self.poses, self.points, self.cam_idx, self.pt_idx,
            self.pixels, self.cameras)
        self.history = [float(h) for h in jax.device_get(hist)]
        return self.history[-1]


class ShardedPGO:
    """Pose-graph optimization sharded over a device mesh.

    Factor edges (the data axis) shard over ``axis``; when ``node_axis``
    is given (2-D mesh), the node-state arrays additionally shard over it
    (model-parallel analog) — GSPMD inserts the all-gathers/psums for the
    cross-shard gathers and J^T accumulations.
    """

    def __init__(self, nodes, edges, poses, mesh=None, axis='dp',
                 node_axis=None, damping=1e-4, cg_iter=50, cg_tol=1e-6):
        self.mesh = make_mesh() if mesh is None else mesh
        n = nodes.lshape[0]
        self._step_args = (n, damping, cg_iter, cg_tol)
        self._step = jax.jit(make_pgo_step(n, damping, cg_iter, cg_tol))
        # pad edges to a mesh multiple with (0, 0) self-loops measuring
        # identity: residual is exactly zero, and node 0 is gauge-fixed so
        # the padded blocks never touch the normal equations.
        edges = jnp.asarray(edges)
        E = edges.shape[0]
        m = self.mesh.shape[axis]
        pad = (-E) % m
        if pad:
            eye = jnp.broadcast_to(
                jnp.array([0., 0., 0., 0., 0., 0., 1.],
                          dtype=poses.dtype), (pad, 7))
            edges = jnp.concatenate(
                [edges, jnp.zeros((pad, 2), edges.dtype)], axis=0)
            poses_data = jnp.concatenate([poses.tensor(), eye], axis=0)
        else:
            poses_data = poses.tensor()
        if node_axis is None:
            self.nodes = replicate(nodes.tensor(), self.mesh)
        else:
            self.nodes = jax.device_put(
                nodes.tensor(), NamedSharding(self.mesh, P(node_axis, None)))
        self.edges = shard_leading(edges, self.mesh, axis)
        self.poses = shard_leading(poses_data, self.mesh, axis)

    def step(self):
        self.nodes, chi2 = self._step(self.nodes, self.edges, self.poses)
        return float(chi2)

    def run(self, steps):
        """``steps`` sharded LM iterations as ONE compiled program
        (single dispatch + host sync).  Returns per-step chi2 history."""
        if not hasattr(self, '_run_cache'):
            self._run_cache = {}
        if steps not in self._run_cache:
            body = make_pgo_step(*self._step_args)

            def run(nodes, edges, poses):
                hist0 = jnp.zeros((steps,), jnp.float32)

                def f(i, st):
                    nodes, hist = st
                    nodes, chi2 = body(nodes, edges, poses)
                    return (nodes, hist.at[i].set(chi2.astype(jnp.float32)))

                return jax.lax.fori_loop(0, steps, f, (nodes, hist0))

            self._run_cache[steps] = jax.jit(run)
        self.nodes, hist = self._run_cache[steps](
            self.nodes, self.edges, self.poses)
        self.history = [float(h) for h in jax.device_get(hist)]
        return self.history[-1]

    @property
    def result(self):
        return SE3(self.nodes)
