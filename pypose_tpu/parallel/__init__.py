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
           'make_pgo_step']


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
        Xi = SE3(nodes_data[edges[:, 0]])
        Xj = SE3(nodes_data[edges[:, 1]])
        Z = SE3(Z_data)

        def one(xi, xj, z):
            def f(eps):
                return residual(SE3(xi).add(eps[0]), SE3(xj).add(eps[1]),
                                SE3(z))
            eps0 = jnp.zeros((2, 6), dtype=nodes_data.dtype)
            return f(eps0), jax.jacrev(f)(eps0)

        r, J = jax.vmap(one)(Xi.tensor(), Xj.tensor(), Z.tensor())
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

    @property
    def result(self):
        return SE3(self.nodes)
