r"""Sparse factor-graph Levenberg-Marquardt, TPU-native.

This replaces the reference's optional external CUDA backend ``bae``
(``LM(model, sparse=True)``: optimizer.py:629-643, TrackingTensor index
recording lietensor.py:1308-1329, ``psjac`` autograd/function.py:51-84) with
a structurally simpler design: in a factor graph the Jacobian's sparsity is
*static* (edge index lists), so no runtime tracing is needed —

* per-edge **tangent-space** Jacobian blocks come from ``vmap(jacrev)`` of
  the edge residual under a left-retraction perturbation: J has shape
  ``[E, d, arity, tan]`` per variable group;
* the normal equations ``A = J^T W J`` are never materialized: CG/PCG sees
  a gather -> block-einsum -> scatter-add **matvec**, the layout XLA maps
  best onto TPU (segment-sum over edges);
* a block-Jacobi preconditioner (per-node ``tan x tan`` blocks, batched
  3x3/6x6 inverses on the MXU) accelerates CG;
* the LM damping/reject loop runs inside ``lax.while_loop`` like the dense
  path (optimizer.py:662-679 semantics).

Unlike the dense path (which differentiates w.r.t. storage coordinates for
reference parity), the sparse path parameterizes in the tangent space: fewer
columns, no zero quaternion-w column, better conditioning.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

from ..lietensor.lietensor import LieTensor
from .corrector import Trivial
from .strategy import TrustRegion
from .solver import CG


def _tan_dim(v):
    return v.ltype.manifold[0] if isinstance(v, LieTensor) else v.shape[-1]


def _retract(v, eps):
    """Left retraction Exp(eps) * v for groups; v + eps for Euclidean."""
    if isinstance(v, LieTensor):
        return v.add(eps)
    return v + eps


class Factor:
    r"""A batch of E identical residual factors.

    Args:
        residual: ``residual(values, consts) -> (d,)`` for ONE edge, where
            ``values`` is a dict ``name -> LieTensor/array`` with leading
            ``arity`` dim (the gathered variable nodes for this edge).
        indices: dict ``name -> int array [E, arity]`` mapping each edge to
            the rows of the corresponding variable group.
        consts: pytree of per-edge constants, leading dim E (measurements).
        weight: optional information matrices ``[E, d, d]`` (or ``[d, d]``).
        kernel: optional robust kernel on ``chi2 = r^T W r`` (FastTriggs
            scaling, corrector.py:69-95).
        valid: optional bool mask ``[E]``; invalid edges contribute zero to
            chi2 (their weight must also be zero).  Used by the sharded
            path to pad edge counts to a mesh multiple neutrally.
    """

    def __init__(self, residual, indices, consts=None, weight=None,
                 kernel=None, jacobian=None, valid=None,
                 batched_jacobian=None):
        self.residual = residual
        # optional analytic jacobian(values, consts) -> (r, {name: J})
        # with J shaped [d, arity, tan] per edge (vmapped internally);
        # falls back to jacrev of the residual when None.
        self.jacobian = jacobian
        # optional WHOLE-BATCH analytic jacobian(values, consts) ->
        # (r [E, d], {name: J [E, d, arity, tan]}) — takes precedence
        # over ``jacobian``.  Used by scalarized forms whose temps must
        # stay [E]-shaped (lietensor/scalarized.py).
        self.batched_jacobian = batched_jacobian
        self.indices = {k: jnp.asarray(v) for k, v in indices.items()}
        for k, v in self.indices.items():
            if v.ndim == 1:
                self.indices[k] = v[:, None]
        self.consts = consts
        self.weight = weight
        self.kernel = kernel
        self.valid = None if valid is None else jnp.asarray(valid, bool)
        self.num_edges = next(iter(self.indices.values())).shape[0]


class SparseLM:
    r"""Levenberg-Marquardt over a factor graph with matvec-CG normal
    equations — the TPU-native replacement for the reference's external
    CUDA sparse backend (``LM(sparse=True)``,
    pypose/optim/optimizer.py:629-643).

    Neither :math:`J` nor :math:`J^\top W J` is ever materialized: per
    LM step the per-edge tangent-space Jacobian blocks come from one
    vmapped ``jacrev`` (or a closed form), and the CG matvec is
    gather -> batched 6x6 block product -> incidence accumulation
    (scatter-free).  The matvec auto-selects, fastest first: circulant
    STENCIL form (edges grouped by index offset; zero gathers) ->
    precomputed coupling-block form -> generic incidence gathers; when
    all edges fit one merged stencil and the preconditioner is
    block-Jacobi, the ENTIRE CG solve runs as a single Pallas kernel
    with all state VMEM-resident (ops/pallas_cg.py — measured 7.9 us/CG
    iteration on sphere2500, ~14x the XLA matvec path).  The LM reject
    loop and the ``optimize()`` plateau schedule run on device
    (lax.while_loop), one host sync per optimization.

    Args:
        params: dict ``name -> LieTensor [N, D] | array [N, D]`` stacked
            variable nodes.
        factors: list of :class:`Factor`.
        solver: matvec-capable solver (default CG with block-Jacobi or
            chain-exact block-cyclic-reduction preconditioning,
            auto-selected from the graph).
        strategy: damping strategy (default TrustRegion).
        fixed: dict ``name -> bool mask [N]`` gauge-fixing nodes.
        cg_iter, cg_tol: inner CG budget.

    Ref semantics: pypose/optim/optimizer.py:330-680 (sparse branch).

    Example — a 30-pose odometry chain with one loop closure:

        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> from pypose_tpu.optim.sparse import SparseLM, pgo_factor
        >>> from pypose_tpu.optim.strategy import TrustRegion
        >>> N = 30
        >>> truth = pp.randn_SE3(N, sigma=0.3, key=jax.random.PRNGKey(0))
        >>> ii = jnp.arange(N - 1)
        >>> edges = jnp.stack([ii, ii + 1], 1)
        >>> edges = jnp.concatenate([edges, jnp.array([[N - 1, 0]])], 0)
        >>> Z = truth[edges[:, 0]].Inv() @ truth[edges[:, 1]]
        >>> noisy = truth @ pp.randn_SE3(N, sigma=0.1,
        ...                              key=jax.random.PRNGKey(1))
        >>> opt = SparseLM({'poses': noisy},
        ...                [pgo_factor(edges, Z)],
        ...                strategy=TrustRegion(radius=1e4),
        ...                fixed={'poses': jnp.zeros(N, bool).at[0].set(True)})
        >>> final = opt.optimize(steps=10, decreasing=1e-9, patience=2)
        >>> bool(final < 1e-8)                # consistent graph: chi2 -> 0
        True
    """

    # transpose-accumulations use the gather-based incidence formulation
    # (scatter-free) when the max node degree is below this; TPU scatters
    # with duplicate indices serialize and dominate CG cost otherwise.
    MAX_INCIDENCE_DEGREE = 64

    def __init__(self, params, factors, solver=None, strategy=None,
                 reject=16, min=1e-6, max=1e32, cg_iter=None, cg_tol=1e-5,
                 fixed=None, precond='auto', scatter=False, matvec='auto',
                 cg_warm=False, cg_forcing=None):
        self.params = dict(params)
        self.factors = list(factors)
        self.strategy = TrustRegion() if strategy is None else strategy
        self.solver = solver
        self.min, self.max = min, max
        self.reject = reject
        self.cg_iter = cg_iter
        self.cg_tol = cg_tol
        # inexact-Newton controls (measured on the 100k PGO, r5):
        #   cg_warm: warm-start each LM step's CG from the previous
        #     step's delta (one extra matvec for r0 = b - A x0).
        #   cg_forcing: Eisenstat-Walker-style forcing — per-LM-step CG
        #     tolerance eta_k = clip(gamma * sqrt(chi2_k / chi2_{k-1}),
        #     cg_tol, 0.1) with gamma = this value; early steps get loose
        #     solves, steps near the plateau (ratio -> 1) stay at
        #     gamma-level looseness while CG's RELATIVE tol against the
        #     shrinking gradient norm provides the absolute tightening.
        #     None = fixed cg_tol (reference semantics).
        self.cg_warm = cg_warm
        self.cg_forcing = cg_forcing
        # fixed: dict name -> bool mask [N] of gauge-fixed nodes (their
        # tangent update is forced to zero — e.g. anchor the first pose).
        self.fixed = fixed or {}
        self.strategy_state = None
        self.loss = None
        self.last = None
        self.reject_count = 0
        self._step_fn = None
        # scatter=True forces `.at[idx].add` accumulation instead of the
        # gather-incidence formulation — duplicate-index scatters serialize
        # on a single TPU chip (measured, CLAUDE.md) but partition cleanly
        # under GSPMD (per-shard partials + psum), so the sharded path may
        # prefer it; keep both measurable.
        self._force_scatter = scatter
        self._build_incidence()
        # coupling-block SpMV (ops/spmv.py): 1.8x faster CG matvec on TPU
        # for arity-2 single-group graphs (PGO shape); 'generic' forces the
        # gather/scatter formulation (used by the sharded path, whose edge
        # arrays are mesh-sharded)
        self._spmv = None
        self._spmv_name = None
        self._stencil_all = None
        if matvec in ('auto', 'coupling'):
            self._build_spmv()
            if matvec == 'coupling' and self._spmv is None:
                raise ValueError(
                    'matvec=\'coupling\' requires every factor to be an '
                    'arity-2 factor over one shared [N, d] variable group '
                    '(the PGO shape); this problem does not qualify — use '
                    "matvec='auto' to fall back to the generic path")
        elif matvec != 'generic':
            raise ValueError(f'matvec must be auto|coupling|generic, '
                             f'got {matvec}')
        if precond == 'auto':
            # the chain-exact (BCR) preconditioner pays off when the graph
            # is chain-dominated: few non-chain edges per node (measured:
            # >2.5x fewer CG iterations at 0.04 loops/node; no win at 0.8)
            has_chain = any(
                s is not None and len(s) == 2 and s[1] == s[0] + 1
                for s in self._slice.values())
            n_nodes = sum(int(np.prod(v.shape[:-1]))
                          for v in self.params.values())
            non_chain_edges = sum(
                f.num_edges for fi, f in enumerate(self.factors)
                if not any(self._slice.get((fi, n)) is not None
                           for n in f.indices))
            # nb: `max` is shadowed by the clamp kwarg in this scope
            self.precond = 'chain' if has_chain and \
                non_chain_edges < 0.3 * (n_nodes if n_nodes > 1 else 1) \
                else 'jacobi'
        else:
            self.precond = precond

    def _build_spmv(self):
        """Build coupling-block SpMV structures when every factor is an
        arity-2 factor over ONE shared variable group (the PGO shape)."""
        names = {n for f in self.factors for n in f.indices}
        if len(names) != 1:
            return
        name = names.pop()
        v = self.params[name]
        if len(v.shape) != 2:
            return  # tiled/batched param layouts keep the generic path
        if any(f.indices[name].shape[1] != 2 for f in self.factors):
            return
        from ..ops.spmv import CouplingSpMV, StencilSpMV
        N = int(v.shape[0])
        t = _tan_dim(v)

        def build(f):
            idx = np.asarray(f.indices[name])
            try:
                # gather-free circulant stencils when the factor's edge
                # offsets cluster (odometry chains, regular loop closures)
                return StencilSpMV(idx, N, t)
            except ValueError:
                return CouplingSpMV(idx, N, t)
        self._spmv = [build(f) for f in self.factors]
        self._spmv_name = name
        # whole-CG Pallas kernel (ops/pallas_cg.py): ALL edges must fit
        # one merged stencil structure and the preconditioner must be
        # block-Jacobi (the kernel keeps the entire solver state in VMEM)
        self._stencil_all = None
        try:
            edges_all = np.concatenate(
                [np.asarray(f.indices[name]) for f in self.factors])
            self._stencil_all = StencilSpMV(edges_all, N, t)
        except ValueError:
            pass

    def _build_incidence(self):
        """Static per-node incidence tables: for each (factor, group),
        inc[n, d] = flattened (edge * arity + slot) position of the d-th
        contribution hitting node n, plus a validity mask.  Turns every
        J^T-side accumulation into gather + masked-sum (no scatter).

        Additionally detects *chain-structured* factors (odometry:
        ``idx[:, a] == offset_a + arange(E)``) where gathers degrade to
        static slices and accumulations to contiguous slice-adds — zero
        gather rows, the fastest path on TPU."""
        self._inc = {}
        self._slice = {}
        for fi, f in enumerate(self.factors):
            for n, idx in f.indices.items():
                idxn = np.asarray(idx)
                E_, A_ = idxn.shape
                offs = idxn[0]
                if E_ > 1 and np.all(
                        idxn == offs[None, :] + np.arange(E_)[:, None]):
                    self._slice[(fi, n)] = tuple(int(o) for o in offs)
                    continue  # slice path never touches incidence tables
                else:
                    self._slice[(fi, n)] = None
                N = int(np.prod(self.params[n].shape[:-1]))
                flat = idxn.reshape(-1)
                deg = np.bincount(flat, minlength=N)
                D = int(deg.max()) if len(flat) else 0
                if self._force_scatter or D > self.MAX_INCIDENCE_DEGREE:
                    self._inc[(fi, n)] = None  # fall back to scatter
                    continue
                inc = np.zeros((N, max(D, 1)), dtype=np.int32)
                mask = np.zeros((N, max(D, 1)), dtype=bool)
                fill = np.zeros(N, dtype=np.int64)
                for p, node in enumerate(flat):
                    inc[node, fill[node]] = p
                    mask[node, fill[node]] = True
                    fill[node] += 1
                self._inc[(fi, n)] = (jnp.asarray(inc), jnp.asarray(mask))

    def _factor_data(self):
        """Per-factor DYNAMIC arrays, threaded through the jitted programs
        as ARGUMENTS.  Closed-over arrays become compile-time constants:
        GSPMD drops their committed shardings (the sharded optimizers
        would silently compile to fully replicated compute — verified:
        zero collectives in the partitioned HLO), and large constants
        ship inside the remote-compile payload (HTTP 413, CLAUDE.md)."""
        return [dict(indices=f.indices, consts=f.consts,
                     weight=None if f.weight is None
                     else jnp.asarray(f.weight),
                     valid=f.valid)
                for f in self.factors]

    def _accumulate(self, fi, n, contrib, idx):
        """Sum per-(edge, slot) contributions into per-node rows.

        contrib: [E, arity, ...] -> [N, ...]; ``idx`` is this factor's
        [E, arity] index array (traced: must come from fdata, not from
        self.factors, to keep shardings)."""
        tail = contrib.shape[2:]
        if len(tail) > 1:
            # NEVER gather/scatter arrays with two small minor dims: XLA
            # tiles the last two dims to (8, 128), so a [N, D, 6, 6]
            # incidence gather moves ~21x the logical bytes (measured:
            # _block_diag_accum at N=1e5/E=1.8e5 was 54 ms of a 205 ms
            # LM step, temp footprint 4.3 GB vs 26 MB logical —
            # tools/formation_prof.py, r3).  Flatten the tail to ONE
            # minor dim for the memory movement, reshape after.
            flat = self._accumulate(
                fi, n, contrib.reshape(contrib.shape[:2] + (-1,)), idx)
            return flat.reshape(flat.shape[:1] + tail)
        N = int(np.prod(self.params[n].shape[:-1]))
        offs = self._slice.get((fi, n))
        if offs is not None:
            # chain-structured: contiguous slice-adds, no gather
            E = contrib.shape[0]
            out = jnp.zeros((N,) + tail, dtype=contrib.dtype)
            for a, o in enumerate(offs):
                out = out.at[o:o + E].add(contrib[:, a])
            return out
        flatc = contrib.reshape((-1,) + tail)
        inc = self._inc.get((fi, n))
        if inc is None:
            out = jnp.zeros((N,) + tail, dtype=contrib.dtype)
            return out.at[idx.reshape(-1)].add(flatc)
        inc_idx, mask = inc
        gathered = flatc[inc_idx]                      # [N, D, ...]
        m = mask.reshape(mask.shape + (1,) * len(tail))
        return jnp.sum(jnp.where(m, gathered, 0), axis=1)

    def _gather_rows(self, fi, n, table, idx):
        """Gather per-edge rows of ``table`` [N, ...] -> [E, arity, ...];
        slice path for chain-structured factors."""
        offs = self._slice.get((fi, n))
        if offs is not None:
            E = idx.shape[0]
            return jnp.stack([table[o:o + E] for o in offs], axis=1)
        return jnp.take(table, idx, axis=0)

    # ------------------------------------------------------------------
    # per-factor residuals + tangent Jacobian blocks
    # ------------------------------------------------------------------
    def _gather(self, params, factor, fd, fi=None):
        vals = {}
        for name, idx in fd['indices'].items():
            p = params[name]
            offs = self._slice.get((fi, name)) if fi is not None else None
            if offs is not None:
                E = idx.shape[0]
                if isinstance(p, LieTensor):
                    data = jnp.stack([p.tensor()[o:o + E] for o in offs],
                                     axis=1)
                    vals[name] = LieTensor(data, ltype=p.ltype)
                else:
                    vals[name] = jnp.stack([p[o:o + E] for o in offs],
                                           axis=1)
            else:
                vals[name] = p[idx] if isinstance(p, LieTensor) \
                    else jnp.take(p, idx, axis=0)
        return vals

    def _edge_r_jac(self, params, factor, fd, fi=None):
        vals = self._gather(params, factor, fd, fi)  # name -> [E, arity, D]
        names = list(factor.indices.keys())

        if factor.batched_jacobian is not None:
            return factor.batched_jacobian(vals, fd['consts'])
        if factor.jacobian is not None:
            return jax.vmap(factor.jacobian)(vals, fd['consts'])

        def one_edge(vals_e, consts_e):
            def f(eps):
                newv = {n: _retract(vals_e[n], eps[n]) for n in names}
                return factor.residual(newv, consts_e)

            eps0 = {n: jnp.zeros(
                (factor.indices[n].shape[1], _tan_dim(params[n])),
                dtype=jnp.result_type(
                    vals_e[n].tensor() if isinstance(vals_e[n], LieTensor)
                    else vals_e[n]))
                for n in names}
            J = jax.jacrev(f)(eps0)          # name -> [d, arity, tan]
            r = f(eps0)
            return r, J

        return jax.vmap(one_edge)(vals, fd['consts'])

    def _weighted(self, factor, fd, r, J):
        """Apply robust kernel (FastTriggs) and info weights -> (r, J, WR, WJ, chi2)."""
        w = fd['weight']
        if w is not None:
            if w.ndim == 2:
                w = jnp.broadcast_to(w, (r.shape[0],) + w.shape)
        if factor.kernel is not None:
            chi = jnp.sum(r * (jnp.einsum('eij,ej->ei', w, r, precision=_HI)
                               if w is not None else r), -1, keepdims=True)
            g1 = jax.grad(lambda v: jnp.sum(factor.kernel(v)))(chi)
            s = jnp.sqrt(jnp.maximum(g1, 0.0))
            r = s * r
            J = {n: s[..., None, None] * j for n, j in J.items()}
        if w is None:
            return r, J, r, J
        WR = jnp.einsum('eij,ej->ei', w, r, precision=_HI)
        WJ = {n: jnp.einsum('eij,ejat->eiat', w, j, precision=_HI) for n, j in J.items()}
        return r, J, WR, WJ

    def _chi2(self, params, fdata):
        total = 0.0
        for fi, (f, fd) in enumerate(zip(self.factors, fdata)):
            vals = self._gather(params, f, fd, fi)
            r = jax.vmap(lambda v, c: f.residual(v, c))(vals, fd['consts'])
            w = fd['weight']
            if w is not None:
                if w.ndim == 2:
                    w = jnp.broadcast_to(w, (r.shape[0],) + w.shape)
                chi = jnp.sum(r * jnp.einsum('eij,ej->ei', w, r, precision=_HI), -1)
            else:
                chi = jnp.sum(r * r, -1)
            if f.kernel is not None:
                chi = f.kernel(chi)
            if fd['valid'] is not None:
                chi = jnp.where(fd['valid'], chi, 0.0)
            total = total + jnp.sum(chi)
        return total

    # ------------------------------------------------------------------
    # normal-equation operators (matvec-only)
    # ------------------------------------------------------------------
    def _mask(self, name, x):
        m = self.fixed.get(name)
        if m is None:
            return x
        return jnp.where(jnp.asarray(m)[:, None], 0.0, x)

    def _matvec(self, blocks, fdata, x):
        """y = J^T W J x over the tangent pytree x (dict name -> [N, tan]).

        Contractions run in flattened [E, d, arity*tan] bmm form (measured
        ~15% faster than the 4-axis einsum on TPU; the residual cost is the
        row gathers, which run at the hardware's per-row gather limit).
        """
        out = {n: jnp.zeros_like(v) for n, v in x.items()}
        for fi, (f, fd, (r, J, WR, WJ)) in enumerate(
                zip(self.factors, fdata, blocks)):
            Jx = 0.0
            for n in f.indices:
                xg = self._gather_rows(fi, n, self._mask(n, x[n]),
                                       fd['indices'][n])
                E, A, T = xg.shape
                Jm = J[n].reshape(E, -1, A * T)
                Jx = Jx + jnp.einsum('eij,ej->ei', Jm, xg.reshape(E, A * T),
                                     precision=_HI)
            for n in f.indices:
                E = Jx.shape[0]
                A = f.indices[n].shape[1]
                WJm = WJ[n].reshape(E, Jx.shape[1], -1)
                contrib = jnp.einsum('eij,ei->ej', WJm, Jx, precision=_HI).reshape(
                    E, A, -1)
                out[n] = out[n] + self._accumulate(fi, n, contrib,
                                                   fd['indices'][n])
        return {n: self._mask(n, v) for n, v in out.items()}

    # small-block contractions build their outputs COLUMN-WISE as stacks
    # of [E] vectors when the block dims are small: the einsum forms
    # materialize (8, 128)-padded [E, a, t, u]-style temps that move
    # 20-100x the logical bytes (measured: _rhs 7.4 ms, _block_diag 22 ms
    # at E=1.8e5 where the roofline is <1 ms — tools/formation_prof.py,
    # r3).  Python loops here are over block DIMS (<= ~8), not edges.
    _SCALARIZE_MAX_T = 8

    def _rhs(self, blocks, fdata):
        """b = -J^T W r."""
        out = {}
        for fi, (f, fd, (r, J, WR, WJ)) in enumerate(
                zip(self.factors, fdata, blocks)):
            for n in f.indices:
                E, d, A, t = WJ[n].shape
                if t <= self._SCALARIZE_MAX_T:
                    cols = [jnp.sum(WJ[n][:, :, a, ti] * r, axis=1)
                            for a in range(A) for ti in range(t)]
                    contrib = jnp.stack(cols, axis=-1).reshape(E, A, t)
                else:
                    contrib = jnp.einsum('edat,ed->eat', WJ[n], r,
                                         precision=_HI)
                acc = -self._accumulate(fi, n, contrib, fd['indices'][n])
                out[n] = acc if n not in out else out[n] + acc
        return {n: self._mask(n, v) for n, v in out.items()}

    def _diag(self, blocks, fdata):
        """diag(J^T W J) per tangent coordinate (for LM damping)."""
        out = {}
        for fi, (f, fd, (r, J, WR, WJ)) in enumerate(
                zip(self.factors, fdata, blocks)):
            for n in f.indices:
                E, d, A, t = WJ[n].shape
                if t <= self._SCALARIZE_MAX_T:
                    cols = [jnp.sum(J[n][:, :, a, ti] * WJ[n][:, :, a, ti],
                                    axis=1)
                            for a in range(A) for ti in range(t)]
                    acc_c = jnp.stack(cols, axis=-1).reshape(E, A, t)
                else:
                    acc_c = jnp.sum(J[n] * WJ[n], axis=1)  # [E, arity, tan]
                acc = self._accumulate(fi, n, acc_c, fd['indices'][n])
                out[n] = acc if n not in out else out[n] + acc
        return out

    def _block_diag_accum(self, blocks, fdata):
        """Per-node tan x tan diagonal blocks of J^T W J."""
        acc_out = {}
        for fi, (f, fd, (r, J, WJ_r, WJ)) in enumerate(
                zip(self.factors, fdata, blocks)):
            for n in f.indices:
                E, d, A, t = WJ[n].shape
                if t <= self._SCALARIZE_MAX_T:
                    cols = [jnp.sum(WJ[n][:, :, a, ti] * J[n][:, :, a, u],
                                    axis=1)
                            for a in range(A) for ti in range(t)
                            for u in range(t)]
                    B = jnp.stack(cols, axis=-1).reshape(E, A, t, t)
                else:
                    B = jnp.einsum('edat,edau->eatu', WJ[n], J[n],
                                   precision=_HI)
                acc = self._accumulate(fi, n, B, fd['indices'][n])
                acc_out[n] = acc if n not in acc_out else acc_out[n] + acc
        return acc_out

    def _damped_blocks(self, accum, damped_scale):
        """Clamp + damp the diagonal of the accumulated blocks (same
        treatment the matvec applies)."""
        out = {}
        for n, B in accum.items():
            d = jnp.clip(jnp.diagonal(B, axis1=-2, axis2=-1),
                         self.min, self.max) * damped_scale[n]
            eye = jnp.eye(B.shape[-1], dtype=B.dtype)
            out[n] = B + (d - jnp.diagonal(B, axis1=-2, axis2=-1))[..., None] \
                * eye + 1e-8 * eye
        return out

    def _block_jacobi(self, accum, damped_scale):
        """Per-node blocks of J^T W J (+ LM damping), inverted."""
        from ..ops.smallinv import blockinv
        damped = self._damped_blocks(accum, damped_scale)
        return {n: blockinv(B) for n, B in damped.items()}

    def _chain_offdiag(self, blocks, n):
        """Super-diagonal blocks U[i] (coupling node i -> i+1) contributed
        by chain-structured factors of group ``n``; None if no chain."""
        N = int(np.prod(self.params[n].shape[:-1]))
        t = _tan_dim(self.params[n])
        U = None
        for fi, (f, (r, J, WR, WJ)) in enumerate(zip(self.factors, blocks)):
            offs = self._slice.get((fi, n))
            if offs is None or len(offs) != 2 or offs[1] != offs[0] + 1:
                continue
            E = J[n].shape[0]
            blk = jnp.einsum('edt,edu->etu', WJ[n][:, :, 0, :],
                             J[n][:, :, 1, :], precision=_HI)
            if U is None:
                U = jnp.zeros((N, t, t), dtype=blk.dtype)
            U = U.at[offs[0]:offs[0] + E].add(blk)
        return U

    def _chain_preconditioner(self, blocks, accum, damped_scale):
        """Block-tridiagonal (chain-exact) preconditioner where chain
        factors exist, block-Jacobi elsewhere.  Returns M(x) callable.

        The odometry chain makes J^T W J's condition grow ~O(N^2); solving
        its tridiagonal part exactly via parallel cyclic reduction
        (ops/block_tridiag.py) collapses CG iteration counts.
        """
        from ..ops.smallinv import blockinv
        from ..ops.block_tridiag import bcr_factor, bcr_solve
        damped = self._damped_blocks(accum, damped_scale)
        appliers = {}
        for n, D in damped.items():
            U = self._chain_offdiag(blocks, n)
            m = self.fixed.get(n)
            if U is None:
                inv = blockinv(D)
                appliers[n] = (lambda inv: lambda x: jnp.einsum(
                    'ntu,nu->nt', inv, x, precision=_HI))(inv)
                continue
            if m is not None:
                mask = jnp.asarray(m)
                eye = jnp.eye(D.shape[-1], dtype=D.dtype)
                D = jnp.where(mask[:, None, None], eye, D)
                # zero couplings touching fixed nodes
                kill = mask[:-1] | mask[1:]
                U = U.at[:-1].set(jnp.where(kill[:, None, None], 0.0,
                                            U[:-1]))
                U = U.at[-1].set(0.0)
            L = jnp.concatenate(
                [jnp.zeros_like(U[:1]),
                 jnp.swapaxes(U[:-1], -1, -2)], axis=0)
            fac = bcr_factor(D, L, U)
            appliers[n] = (lambda fac: lambda x: bcr_solve(fac, x))(fac)
        return lambda x: {n: appliers[n](x[n]) for n in x}

    # ------------------------------------------------------------------
    def _core(self, params, strat_state, fdata, x0=None, tol_dyn=None):
        blocks = [self._weighted(f, fd, *self._edge_r_jac(params, f, fd, fi))
                  for fi, (f, fd) in enumerate(zip(self.factors, fdata))]
        b = self._rhs(blocks, fdata)
        # dynamic (traced) CG tolerance from the forcing schedule; the
        # whole-CG Pallas kernel keeps the static cg_tol (its loop bound
        # is baked into the kernel)
        cg_tol = self.cg_tol if tol_dyn is None else tol_dyn
        diag_raw = self._diag(blocks, fdata)
        diagA = {n: jnp.clip(v, self.min, self.max)
                 for n, v in diag_raw.items()}
        last = self._chi2(params, fdata)
        nparam = sum(int(np.prod(v.shape[:-1])) * _tan_dim(v)
                     for v in params.values())
        maxiter = self.cg_iter if self.cg_iter is not None \
            else min(10 * nparam, 500)

        # per-node diagonal blocks of J^T W J: used by the preconditioners
        # AND as the D-part of the coupling-block matvec
        accum = self._block_diag_accum(blocks, fdata)
        if self._spmv is not None:
            nm = self._spmv_name
            # coupling blocks precomputed ONCE per step, amortized over
            # every CG iteration of every damping retry (ops/spmv.py)
            spmv_states = [sp.precompute(blk[1][nm], blk[3][nm])
                           for sp, blk in zip(self._spmv, blocks)]
            D_spmv = accum[nm]

            def raw_matvec(x):
                xm = self._mask(nm, x[nm])
                y = jnp.einsum('ntu,nu->nt', D_spmv, xm, precision=_HI)
                for sp, st in zip(self._spmv, spmv_states):
                    y = y + sp.couple(st, xm)
                return {nm: self._mask(nm, y)}
        else:
            def raw_matvec(x):
                return self._matvec(blocks, fdata, x)

        # whole-CG Pallas kernel path: merged stencil channels, solved by
        # ops/pallas_cg.py (VMEM-resident whole-CG kernel when the [t, N]
        # state fits the ~10 MB scoped budget; HBM-streamed tiled kernels
        # past that); block-Jacobi only.  Off-TPU, oversize problems
        # route to the plain [N, t]-layout einsum CG below instead —
        # stencil_cg's transposed XLA fallback does not fuse its t*t-
        # slice _block_mul (283 us/iter at N=1e5 vs ~30 us einsum,
        # tools/matvec_prof.py r3).
        use_kernel = (self._stencil_all is not None
                      and self.precond != 'chain')
        if use_kernel:
            from ..ops.pallas_cg import stencil_cg_fits_vmem
            _nm = self._spmv_name
            _N, _t = b[_nm].shape
            fits = stencil_cg_fits_vmem(
                _N, _t, len(self._stencil_all.offsets))
            if jax.default_backend() == 'tpu':
                # oversize problems route to stencil_cg's HBM-streamed
                # tiled kernels when enabled; default stays the einsum
                # CG until the tiled path is validated on real hardware
                # (set PPT_TILED_CG=1 to opt in)
                import os
                use_kernel = fits or os.environ.get('PPT_TILED_CG') == '1'
            else:
                use_kernel = fits
        if use_kernel:
            nm = self._spmv_name
            C_all = self._stencil_all.precompute_multi(
                [(blk[1][nm], blk[3][nm]) for blk in blocks])

        # scalarized block-Jacobi precomputation (einsum-CG path): unpack
        # the [N, t, t] accum blocks into t*t [N] component vectors ONCE
        # (one transpose pass) so the per-damping inverse runs as fused
        # elementwise [N]-vector arithmetic.  The matrix-form
        # _damped_blocks + inv6x6 chain builds ~40 [N, 3, 3] temps, each
        # (8, 128)-padded to ~40x its logical bytes — measured 26 ms of a
        # 109 ms LM step at N=1e5 (tools/pgo100k_prof.py, r4).
        names = list(diagA.keys())
        scalar_pc = (self.precond != 'chain' and not use_kernel
                     and len(names) == 1
                     and accum[names[0]].shape[-1] in (3, 6))
        if scalar_pc:
            n0 = names[0]
            t0 = accum[n0].shape[-1]
            acc_T = jnp.transpose(accum[n0], (1, 2, 0))      # [t, t, N]
            pc_comps = [acc_T[i, j] for i in range(t0) for j in range(t0)]
            pc_diag_cl = [jnp.clip(pc_comps[i * t0 + i], self.min, self.max)
                          for i in range(t0)]

        def solve(damping, x0_=None):
            if use_kernel:
                from ..ops.pallas_cg import stencil_cg
                from ..ops.smallinv import blockinv
                dcorr = diagA[nm] - diag_raw[nm] + damping * diagA[nm]
                damped = self._damped_blocks(accum, {nm: 1.0 + damping})
                Minv = blockinv(damped[nm])
                x, _ = stencil_cg(
                    b[nm], accum[nm], dcorr, Minv, C_all,
                    tuple(self._stencil_all.offsets),
                    fixed_mask=self.fixed.get(nm),
                    maxiter=maxiter, tol=self.cg_tol,
                    use_pallas=jax.default_backend() == 'tpu')
                return {nm: x}

            def Avp(x):
                # A with its diagonal clamped to [min, max] then damped,
                # matching the reference's in-place diag treatment
                # (optimizer.py:655-657, 663-666)
                y = raw_matvec(x)
                return {n: y[n] + (diagA[n] - diag_raw[n]
                                   + damping * diagA[n])
                        * self._mask(n, x[n]) for n in y}

            scale = {n: 1.0 + damping for n in diagA}
            if self.precond == 'chain':
                M = self._chain_preconditioner(blocks, accum, scale)
            elif scalar_pc:
                from ..ops.smallinv import blockinv_scalar
                comps = list(pc_comps)
                for i in range(t0):
                    comps[i * t0 + i] = (pc_diag_cl[i] * (1.0 + damping)
                                         + 1e-8)
                binv = blockinv_scalar(comps)
                # repack ONCE to [N, t, t] and apply with the einsum: an
                # all-scalarized M apply (36 [N]-vector FMAs on [N, 6]
                # column slices) costs +42 us/CG-iter from the (8, 128)
                # lane padding of the column reads — measured SLOWER
                # end-to-end (73.4 vs 62.7 ms/solve) despite saving the
                # 28 ms matrix-form build (tools/pc_build_prof.py, r4).
                Binv = jnp.stack(binv).reshape(t0, t0, -1).transpose(
                    2, 0, 1)

                def M(x):
                    return {n0: jnp.einsum('ntu,nu->nt', Binv, x[n0],
                                           precision=_HI)}
            else:
                Binv = self._block_jacobi(accum, scale)

                def M(x):
                    return {n: jnp.einsum('ntu,nu->nt', Binv[n], x[n],
                                          precision=_HI) for n in x}

            x, _ = jax.scipy.sparse.linalg.cg(
                Avp, b, x0=x0_, tol=cg_tol, maxiter=maxiter, M=M)
            return x

        def retract_all(p, delta):
            out = {}
            for n, v in p.items():
                d = self._mask(n, delta[n])
                if isinstance(v, LieTensor):
                    new = v.add(d)
                    if type(new) is not type(v):
                        new = type(v)(new)
                    out[n] = new
                else:
                    out[n] = v + d
            return out

        def pred_reduction(blocks_, delta, WRs):
            """-(JD)^T W (2R + JD) accumulated per factor (column-
            stacked contractions — the einsum forms materialize
            (8,128)-padded [E, d, a, t] broadcast temps)."""
            total = 0.0
            for fi2, (f, fd, (r, J, WR, WJ)) in enumerate(
                    zip(self.factors, fdata, blocks_)):
                Jd = 0.0
                for n in f.indices:
                    xg = self._gather_rows(fi2, n, self._mask(n, delta[n]),
                                           fd['indices'][n])
                    d_ = J[n].shape[1]
                    if d_ <= 8:
                        Jd = Jd + jnp.stack(
                            [jnp.sum(J[n][:, i] * xg, axis=(1, 2))
                             for i in range(d_)], axis=-1)
                    else:
                        Jd = Jd + jnp.einsum('edat,eat->ed', J[n], xg,
                                             precision=_HI)
                WJd = jnp.einsum('eij,ej->ei', jnp.broadcast_to(
                    fd['weight'], (r.shape[0],) + (r.shape[-1],) * 2
                ), Jd) if fd['weight'] is not None else Jd
                total = total + jnp.sum(WJd * (2.0 * r + Jd))
            return -total

        def cond(state):
            return ~state[-1]

        def body(state):
            p0, loss, strat, count, D_prev, _ = state
            D = solve(strat['damping'],
                      D_prev if self.cg_warm else None)
            flat = jnp.concatenate([v.reshape(-1) for v in
                                    jax.tree_util.tree_leaves(D)])
            bad = ~jnp.all(jnp.isfinite(flat))
            D = jax.tree_util.tree_map(
                lambda v: jnp.where(bad, jnp.zeros_like(v), v), D)
            cand = retract_all(p0, D)
            loss_new = self._chi2(cand, fdata)
            # a non-finite candidate loss is as bad as a non-finite delta
            # (`last < NaN` is False and would force-accept it)
            bad = bad | ~jnp.isfinite(loss_new)
            pred = pred_reduction(blocks, D, None)
            q = (last - loss_new) / jnp.where(pred == 0, 1e-31, pred)
            # non-positive predicted reduction (unconverged-CG garbage
            # step): hard reject — the double-negative ratio otherwise
            # scores it HIGH and grows the radius every rejection.  See
            # strategy._quality; measured divergence on the BA matvec-CG
            # path (r5); the reference divides blindly.
            q = jnp.where(pred > 0, q, -1.0)
            strat_new = self._strategy_update(strat, q)
            worse = last < loss_new
            rejectable = worse & (count < self.reject) & ~bad
            done = ~rejectable
            take = done & ~bad
            p_out = jax.tree_util.tree_map(
                lambda a, c: jnp.where(take, c, a), p0, cand)
            loss_out = jnp.where(take, loss_new, last)
            return (p_out, loss_out, strat_new,
                    count + rejectable.astype(count.dtype), D, done)

        D0 = x0 if x0 is not None \
            else {n: jnp.zeros_like(v) for n, v in b.items()}
        state0 = (params, last, strat_state, jnp.asarray(0, jnp.int32),
                  D0, jnp.asarray(False))
        p_f, loss_f, strat_f, count_f, D_f, _ = jax.lax.while_loop(
            cond, body, state0)
        return p_f, loss_f, last, strat_f, count_f, D_f

    def _strategy_update(self, strat, quality):
        """Strategy update from a precomputed gain ratio (sparse path never
        materializes J, so the dense strategies' (J, D, R) signature is
        bypassed)."""
        s = self.strategy
        if hasattr(s, 'up'):  # TrustRegion / Adaptive
            if hasattr(s, 'down0'):  # TrustRegion
                radius = 1.0 / strat['damping']
                down = strat['down']
                radius_new = jnp.where(
                    quality > s.high, s.up * radius,
                    jnp.where(quality > s.low, radius, radius * down))
                down_new = jnp.where(
                    quality > s.low, jnp.asarray(s.down0, down.dtype),
                    down * s.factor)
                return {'damping': 1.0 / jnp.clip(radius_new, s.min, s.max),
                        'down': jnp.clip(down_new, s.min, s.max)}
            d = strat['damping']
            d = jnp.where(quality > s.high, d * s.down,
                          jnp.where(quality > s.low, d, d * s.up))
            return {'damping': jnp.clip(d, s.min, s.max)}
        return strat  # Constant

    def _zero_delta(self, params):
        """Zero tangent-space delta matching ``_rhs``'s structure (only
        names some factor touches appear in the normal equations)."""
        names = set()
        for f in self.factors:
            names.update(f.indices)
        out = {}
        for n in sorted(names):
            v = params[n]
            if isinstance(v, LieTensor):
                out[n] = jnp.zeros(tuple(v.lshape) + (_tan_dim(v),),
                                   dtype=v.tensor().dtype)
            else:
                out[n] = jnp.zeros(v.shape, dtype=v.dtype)
        return out

    def step(self):
        if self.strategy_state is None:
            dtype = jax.tree_util.tree_leaves(self.params)[0].dtype
            self.strategy_state = self.strategy.init(dtype)
        if self._step_fn is None:
            self._step_fn = jax.jit(self._core)
        p, loss, last, strat, count, _ = self._step_fn(
            self.params, self.strategy_state, self._factor_data())
        self.params = p
        self.strategy_state = strat
        # single host round-trip for all scalars (each blocking transfer
        # pays the full tunnel latency on remote TPUs)
        loss, last, count = jax.device_get((loss, last, count))
        self.reject_count = int(count)
        self.last = float(last)
        self.loss = float(loss)
        return self.loss


    def optimize(self, steps=10, patience=5, decreasing=1e-3):
        """Run up to ``steps`` LM iterations fully on device: the outer
        StopOnPlateau loop (scheduler.py:64-160 semantics: patience on
        relative decrease, stop on rejection) is a ``lax.while_loop`` around
        ``_core``, so no host sync happens until the end.  Returns the final
        chi2; per-step losses land in ``self.history``."""
        if self.strategy_state is None:
            dtype = jax.tree_util.tree_leaves(self.params)[0].dtype
            self.strategy_state = self.strategy.init(dtype)

        def run(params, strat, fdata):
            hist0 = jnp.full((steps,), jnp.nan, dtype=jnp.float32)

            def cond(st):
                return (~st[-1]) & (st[4] < steps)

            def body(st):
                p, strat_s, last_loss, hist, i, pat, D_prev, rel, _ = st
                tol_dyn = None
                if self.cg_forcing is not None:
                    # Eisenstat-Walker choice-2 style: eta_k = gamma *
                    # (|F_k| / |F_{k-1}|) with chi2 = |F|^2; CG's
                    # RELATIVE tol against the shrinking gradient gives
                    # the absolute tightening near convergence
                    tol_dyn = jnp.clip(
                        self.cg_forcing * jnp.sqrt(rel),
                        self.cg_tol, 0.1)
                p2, loss, last, strat2, count, D2 = self._core(
                    p, strat_s, fdata,
                    D_prev if self.cg_warm else None, tol_dyn)
                rel2 = jnp.where(
                    jnp.isfinite(last) & (last > 0),
                    jnp.clip(loss / jnp.maximum(last, 1e-31), 0.0, 1.0),
                    jnp.ones_like(rel))
                hist = hist.at[i].set(loss.astype(jnp.float32))
                pat2 = jnp.where(last - loss < decreasing, pat + 1,
                                 jnp.zeros_like(pat))
                # quit on rejection only when the step also failed to
                # make the required progress (the reference quits on ANY
                # rejection, scheduler.py:153-159 — wrong for recoverable
                # damping escalation; see optim/ba.py optimize)
                stop = (pat2 >= patience) | \
                    ((count > 0) & (last - loss < decreasing))
                return (p2, strat2, loss, hist, i + 1, pat2, D2, rel2,
                        stop)

            D0 = self._zero_delta(params)
            init = (params, strat, jnp.asarray(jnp.inf, jnp.float32),
                    hist0, jnp.asarray(0, jnp.int32),
                    jnp.asarray(0, jnp.int32), D0,
                    jnp.asarray(1.0, jnp.float32), jnp.asarray(False))
            st = jax.lax.while_loop(cond, body, init)
            p, strat_f, loss, hist, nsteps = st[0], st[1], st[2], st[3], \
                st[4]
            return p, strat_f, loss, hist, nsteps

        key = ('optimize', steps, patience, decreasing)
        if key not in getattr(self, '_opt_cache', {}):
            if not hasattr(self, '_opt_cache'):
                self._opt_cache = {}
            self._opt_cache[key] = jax.jit(run)
        p, strat, loss, hist, nsteps = self._opt_cache[key](
            self.params, self.strategy_state, self._factor_data())
        self.params = p
        self.strategy_state = strat
        loss, hist, nsteps = jax.device_get((loss, hist, nsteps))
        self.loss = float(loss)
        self.history = [float(h) for h in hist[:int(nsteps)]]
        return self.loss


def pgo_factor(edges, poses, infos=None, kernel=None, name='poses'):
    r"""Relative-pose factor for pose-graph optimization — any group type
    whose storage supports ``Inv/@/Log`` (SE3 for classical PGO; Sim3 for
    scale-drift graphs, a capability the reference's SE3-only pgo example
    does not reach).

    Residual per edge (i, j): ``Log(Z^{-1} (X_i^{-1} X_j))`` with optional
    tangent-dim information-matrix weights.  All four group families get
    the closed-form tangent Jacobian ``dr/d(delta_j) = Jl^-1(r) Adj(M)``
    (exact — including Sim3, whose Jl is computed by scaling-and-squaring
    where the reference truncates); unknown types fall back to the
    vmapped ``jacrev`` of the residual (Factor's default).  Workload
    parity: examples/module/pgo/pgo.py:25-43.
    """
    from ..lietensor import jacobian as _jac
    from ..lietensor import operation as _op
    from ..lietensor.lietensor import (SO3_type, SE3_type, RxSO3_type,
                                       Sim3_type)

    _FORMS = {SO3_type: (_jac.so3_Jl_inv, _op.SO3_Adj),
              SE3_type: (_jac.se3_Jl_inv, _op.SE3_Adj),
              RxSO3_type: (_jac.rxso3_Jl_inv, _op.RxSO3_Adj),
              Sim3_type: (_jac.sim3_Jl_inv, _op.Sim3_Adj)}

    def residual(values, Z):
        Xi, Xj = values[name][0], values[name][1]
        return (Z.Inv() @ (Xi.Inv() @ Xj)).Log().tensor()

    def make_jacobian(Jl_inv, Adj):
        def jacobian(values, Z):
            """Closed form: with M = Z^-1 Xi^-1 and r = Log(M Xj),
            dr/d(delta_j) = Jl^-1(r) Adj(M) and
            dr/d(delta_i) = -dr/d(delta_j) (left-perturbation)."""
            Xi, Xj = values[name][0], values[name][1]
            M = Z.Inv() @ Xi.Inv()
            r = (M @ Xj).Log().tensor()
            Jj = jnp.matmul(Jl_inv(r), Adj(M.tensor()), precision=_HI)
            J = jnp.stack([-Jj, Jj], axis=1)      # [d, arity=2, tan]
            return r, {name: J}
        return jacobian

    form = _FORMS.get(poses.ltype)
    jac = make_jacobian(*form) if form is not None else None

    bjac = None
    if poses.ltype is SE3_type:
        # scalarized whole-batch form: identical math, all temps
        # [E]-shaped — the vmapped AoS chain materializes (8,128)-padded
        # [E, 3, 3] temps and runs ~25x off roofline at E=1.8e5
        # (lietensor/scalarized.py, tools/formation_prof.py r3)
        from ..lietensor.scalarized import se3_pgo_blocks

        def bjac(values, Z):
            X = values[name].tensor()
            r, J = se3_pgo_blocks(X[:, 0], X[:, 1], Z.tensor())
            return r, {name: J}

    return Factor(residual, indices={name: edges}, consts=poses,
                  weight=infos, kernel=kernel, jacobian=jac,
                  batched_jacobian=bjac)


def split_chain_edges(edges, min_run=64):
    """Partition edge rows into maximal odometry runs (j == i+1 with
    consecutive i) and the rest.  Chain runs hit SparseLM's slice path
    (zero gather rows).  Returns (list of row-index arrays for runs,
    rest row-index array)."""
    e = np.asarray(edges)
    rows = np.arange(e.shape[0])
    cand = (e[:, 1] == e[:, 0] + 1)
    chain_rows = rows[cand]
    if len(chain_rows) == 0:
        return [], rows
    order = np.argsort(e[chain_rows, 0], kind='stable')
    chain_rows = chain_rows[order]
    ii = e[chain_rows, 0]
    breaks = np.nonzero(np.diff(ii) != 1)[0] + 1
    runs = np.split(chain_rows, breaks)
    keep, rest_extra = [], []
    for run in runs:
        (keep if len(run) >= min_run else rest_extra).append(run)
    rest = np.concatenate([rows[~cand]] + rest_extra) if rest_extra \
        else rows[~cand]
    return keep, rest


def pgo(nodes, edges, poses, infos=None, steps=10, strategy=None,
        kernel=None, fix_first=True, cg_iter=100, cg_tol=1e-5, tol=1e-7,
        verbose=False, split_chains=True):
    r"""Solve a pose graph with SparseLM; returns (optimized SE3 nodes,
    chi2 history).  Odometry chains are split into slice-structured
    factors automatically (gather-free fast path).  Workload parity:
    examples/module/pgo/pgo.py:45-85."""
    n = nodes.lshape[0]
    fixed = None
    if fix_first:
        fixed = {'poses': jnp.zeros(n, bool).at[0].set(True)}
    edges = jnp.asarray(edges)
    factors = []
    if split_chains:
        runs, rest = split_chain_edges(edges)
        for run in runs:
            run = jnp.asarray(run)
            factors.append(pgo_factor(
                edges[run], poses[run],
                None if infos is None else infos[run], kernel))
        if len(rest):
            rest = jnp.asarray(rest)
            factors.append(pgo_factor(
                edges[rest], poses[rest],
                None if infos is None else infos[rest], kernel))
    else:
        factors = [pgo_factor(edges, poses, infos, kernel)]
    opt = SparseLM({'poses': nodes}, factors,
                   strategy=strategy or TrustRegion(radius=1e4),
                   fixed=fixed, cg_iter=cg_iter, cg_tol=cg_tol)
    history = []
    for i in range(steps):
        loss = opt.step()
        history.append(loss)
        if verbose:
            print(f'pgo step {i}: chi2 {loss:.6e}')
        if opt.reject_count > 0 and \
                (len(history) < 2 or history[-2] - history[-1] <= 0):
            # rejection + no progress = plateau; rejection alone can be
            # recoverable damping escalation (see optim/ba.py optimize)
            break
        if len(history) > 1 and \
                history[-2] - history[-1] < tol * max(1.0, history[-1]):
            break
    return opt.params['poses'], history
