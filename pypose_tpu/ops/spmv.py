r"""Coupling-block SpMV for factor-graph normal equations, TPU-native.

The CG matvec ``y = (J^T W J) x`` over a 2-node factor graph is the hot
loop of SparseLM (reference capability: the external CUDA backend's sparse
``A @ x``, optimizer.py:629-643).  The gather/scatter formulation is
row-gather-bound on TPU (~3.4-5 ns/row, measured — tools/matvec_prof.py).
This module reformulates it algebraically:

    A = D + sum_e [ C_e (i<-j) + C_e^T (j<-i) ]

* ``D`` — per-node txt diagonal blocks (zero gathers: one batched einsum),
* ``C_e = J_i^T W J_j`` — per-edge txt coupling blocks, precomputed ONCE
  per LM step (J is constant across a CG solve, amortized over all CG
  iterations),
* chain edges (j = i+1): coupling products are pure SLICES,
* general edges: sorted by destination tile at setup, so accumulation is a
  static f32 one-hot matmul on the MXU (gather-free); only the x source
  rows are gathered (the irreducible part).

Measured on 1x TPU v5e (sphere2500, E=4499): 62 us/matvec vs 112 us for
the incidence formulation (1.8x); with pre-sorted couplings the runtime
permutation gathers vanish as well.
"""

import numpy as np

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

TILE = 128


def _coupling_flat(J, WJ):
    """C_e = J_i^T W J_j as FLAT [E, t*t] columns of [E] vectors.

    The einsum form ('edt,edu->etu') materializes an (8, 128)-padded
    [E, t, t] temp that moves ~21x the logical bytes (measured —
    tools/formation_prof.py, r3); column stacking keeps every
    intermediate [E]-shaped.  Python loops run over t*t <= 64, not E.
    """
    t = J.shape[-1]
    if t > 8:
        return jnp.einsum('edt,edu->etu', WJ[:, :, 0, :], J[:, :, 1, :],
                          precision=_HI).reshape(-1, t * t)
    cols = [jnp.sum(WJ[:, :, 0, ti] * J[:, :, 1, u], axis=1)
            for ti in range(t) for u in range(t)]
    return jnp.stack(cols, axis=-1)


class CouplingSpMV:
    r"""Static structure + per-step compiled matvec for one arity-2 factor
    group.

    Args:
        edges: int [E, 2] node index pairs (host array; structure is
            static).
        n_nodes: number of nodes N.
        tan: tangent dim t (6 for SE3).

    Per LM step, call :meth:`precompute` with the weighted Jacobian blocks
    to get the operator state; then :meth:`matvec` applies it.
    """

    def __init__(self, edges, n_nodes, tan):
        edges = np.asarray(edges)
        self.N = int(n_nodes)
        self.tan = int(tan)
        E = edges.shape[0]
        self.E = E
        self.T = (self.N + TILE - 1) // TILE

        # chain rows: j == i+1 AND i values consecutive per maximal run —
        # here we only need j == i+1 (slice adds handle arbitrary i runs
        # via one zeros+add per run; we keep it simple with per-row i0)
        chain = edges[:, 1] == edges[:, 0] + 1
        self.chain_rows = np.nonzero(chain)[0]
        self.loop_rows = np.nonzero(~chain)[0]
        self.ci = edges[self.chain_rows, 0]
        li = edges[self.loop_rows, 0]
        lj = edges[self.loop_rows, 1]

        # chain contributions accumulate by slice only if ci is contiguous;
        # general case: one-hot the chain rows too (dest i and dest j=i+1).
        self._chain_contig = (len(self.ci) > 0
                              and np.all(np.diff(self.ci) == 1))
        self.ci0 = int(self.ci[0]) if self._chain_contig else 0

        # tile structures for the two loop-edge directions
        self.dir_i = self._build_dir(li, lj)   # accumulate at i, source j
        self.dir_j = self._build_dir(lj, li)   # accumulate at j, source i
        if not self._chain_contig and len(self.chain_rows):
            # degenerate chains: route them through the general path
            ci = edges[self.chain_rows, 0]
            cj = edges[self.chain_rows, 1]
            self.dir_ci = self._build_dir(ci, cj)
            self.dir_cj = self._build_dir(cj, ci)

    def _build_dir(self, dst, src):
        """Sort rows by destination tile; pad each tile to a common K.

        Returns dict(order [T*K] row index into the direction's rows with
        -1 padding, onehot f32 [T, TILE, K], src [T*K] x-source rows,
        K)."""
        R = len(dst)
        if R == 0:
            return None
        order_ = np.argsort(dst, kind='stable')
        tile_of = dst[order_] // TILE
        counts = np.bincount(tile_of, minlength=self.T)
        K = max(int(counts.max()), 1)
        order = np.full((self.T, K), -1, np.int64)
        onehot = np.zeros((self.T, TILE, K), np.float32)
        srcp = np.zeros((self.T, K), np.int32)
        pos = np.zeros(self.T, np.int64)
        for r in order_:
            tl = dst[r] // TILE
            k = pos[tl]
            order[tl, k] = r
            onehot[tl, dst[r] - tl * TILE, k] = 1.0
            srcp[tl, k] = src[r]
            pos[tl] += 1
        return dict(order=jnp.asarray(order.reshape(-1)),
                    valid=jnp.asarray((order >= 0).reshape(-1, 1),
                                      jnp.float32),
                    onehot=jnp.asarray(onehot),
                    src=jnp.asarray(srcp.reshape(-1)), K=K)

    # ------------------------------------------------------------------
    def precompute(self, J, WJ):
        """Build the per-step operator state from weighted Jacobian blocks.

        J, WJ: [E, d, 2, t] (d = residual dim).  Returns a pytree used by
        :meth:`matvec`; cost is one batched einsum + static gathers, paid
        once per LM step and amortized over every CG iteration.
        """
        # off-diagonal coupling blocks C_e = J_i^T W J_j, built and
        # gathered/permuted in FLAT [rows, t*t] layout: [R, t, t] forms
        # tile the (t, t) minor dims to (8, 128) and move ~21x the
        # logical bytes (tools/formation_prof.py, r3)
        t = self.tan
        Cf = _coupling_flat(J, WJ)
        state = {}
        cr = jnp.asarray(self.chain_rows)
        lr = jnp.asarray(self.loop_rows)
        if self._chain_contig and len(self.chain_rows):
            state['Cc'] = Cf[cr].reshape(-1, t, t)
        for name, dirn, rows in (('i', self.dir_i, lr),
                                 ('j', self.dir_j, lr)):
            if dirn is None:
                continue
            Cd = (Cf[rows][jnp.maximum(dirn['order'], 0)]
                  * dirn['valid']).reshape(-1, t, t)
            # direction j applies C^T
            state['C' + name] = Cd if name == 'i' else \
                jnp.swapaxes(Cd, -1, -2)
        if not self._chain_contig and len(self.chain_rows):
            for name, dirn in (('ci', self.dir_ci), ('cj', self.dir_cj)):
                Cd = (Cf[cr][jnp.maximum(dirn['order'], 0)]
                      * dirn['valid']).reshape(-1, t, t)
                state['C' + name] = Cd if name == 'ci' else \
                    jnp.swapaxes(Cd, -1, -2)
        return state

    def _apply_dir(self, dirn, Cd, x):
        """One direction: gather sources, couple, one-hot accumulate."""
        t = self.tan
        xs = jnp.take(x, dirn['src'], axis=0)           # [T*K, t]
        c = jnp.einsum('etu,eu->et', Cd, xs, precision=_HI)
        cp = c.reshape(self.T, dirn['K'], t)
        out = jnp.einsum('tnk,tkd->tnd', dirn['onehot'], cp,
                         precision=_HI, preferred_element_type=x.dtype)
        return out.reshape(self.T * TILE, t)[:self.N]

    def matvec(self, state, D, x):
        """y = D x + couplings, with D [N, t, t] diagonal blocks."""
        y = jnp.einsum('ntu,nu->nt', D, x, precision=_HI)
        return y + self.couple(state, x)

    def couple(self, state, x):
        """Off-diagonal part only: sum_e C_e x_j -> i  and  C_e^T x_i -> j."""
        y = jnp.zeros((self.N, self.tan), x.dtype)
        if 'Cc' in state:
            Ec = len(self.chain_rows)
            i0 = self.ci0
            Cc = state['Cc']
            xi = jax.lax.dynamic_slice_in_dim(x, i0, Ec)
            xj = jax.lax.dynamic_slice_in_dim(x, i0 + 1, Ec)
            yi = jnp.einsum('etu,eu->et', Cc, xj, precision=_HI)
            yj = jnp.einsum('etu,et->eu', Cc, xi, precision=_HI)
            y = y.at[i0:i0 + Ec].add(yi)
            y = y.at[i0 + 1:i0 + 1 + Ec].add(yj)
        for name, dirn in (('i', self.dir_i), ('j', self.dir_j),
                           ('ci', getattr(self, 'dir_ci', None)),
                           ('cj', getattr(self, 'dir_cj', None))):
            if dirn is not None and ('C' + name) in state:
                y = y + self._apply_dir(dirn, state['C' + name], x)
        return y


class StencilSpMV:
    r"""Circulant-stencil SpMV: the gather-free limit for banded graphs.

    Pose graphs are near-circulant: odometry edges have offset
    ``delta = j - i = 1`` and loop closures cluster on few offsets (the
    synthetic sphere has exactly one: j = i + stride mod N; revisit-style
    closures in real graphs cluster similarly).  Grouping edges by
    circular offset turns the coupling part of ``A x`` into offset
    stencils

        y += einsum(C_delta, roll(x, -delta));  y += roll(einsum(C_delta^T, x), +delta)

    — ZERO gathers, pure elementwise + lane rotations, the
    fastest possible formulation on TPU (row gathers are the measured
    frontier at 3.4-5 ns/row; rolls and batched 6x6 products run at VPU
    roofline).  Construction refuses graphs needing more than
    ``max_offsets`` channels; callers fall back to :class:`CouplingSpMV`.

    Duplicate (i, delta) edges sum into the same channel slot.
    """

    def __init__(self, edges, n_nodes, tan, max_offsets=16):
        edges = np.asarray(edges)
        self.N = int(n_nodes)
        self.tan = int(tan)
        E = edges.shape[0]
        delta = (edges[:, 1] - edges[:, 0]) % self.N
        offsets = np.unique(delta)
        if len(offsets) > max_offsets:
            raise ValueError(f'{len(offsets)} distinct circular offsets '
                             f'> max_offsets={max_offsets}')
        if len(offsets) * self.N > 4 * max(E, 1):
            # channels would be mostly zeros: stencil work is
            # O(n_off * N) regardless of E, so sparse channels lose to
            # the coupling formulation
            raise ValueError('stencil channels too sparse '
                             f'({len(offsets)} offsets x {self.N} nodes '
                             f'for {E} edges)')
        self.offsets = [int(d) for d in offsets]
        # channel slot of edge e: (offset_index, source node i)
        off_index = np.searchsorted(offsets, delta)
        self._slot = jnp.asarray(off_index * self.N + edges[:, 0])
        self.E = E

    def precompute(self, J, WJ):
        """Scatter per-edge coupling blocks into offset channels
        ``C [n_off, N, t, t]`` (once per LM step; duplicates sum)."""
        return self.precompute_multi([(J, WJ)])

    def precompute_multi(self, pairs):
        """Channels from per-factor (J, WJ) weighted-block lists whose
        concatenated edge order matches this object's construction
        order (used to merge all of a SparseLM's factors into the ONE
        stencil the whole-CG kernel consumes)."""
        t = self.tan
        C = jnp.concatenate([_coupling_flat(J, WJ) for J, WJ in pairs],
                            axis=0) if len(pairs) > 1 \
            else _coupling_flat(*pairs[0])
        # scatter in [rows, t*t] layout: a [rows, t, t] scatter-add tiles
        # the (t, t) minor dims to (8, 128) and moves ~21x the logical
        # bytes (measured 25 ms at N=1e5 — tools/formation_prof.py, r3)
        chan = jnp.zeros((len(self.offsets) * self.N, t * t), C.dtype)
        return chan.at[self._slot].add(C).reshape(
            len(self.offsets), self.N, t, t)

    def couple(self, C, x):
        """Off-diagonal part via offset stencils (zero gathers).

        With bf16 channels (and bf16 x) the contractions run DEFAULT
        precision single-pass with f32 accumulation — half the HBM
        bytes of the f32 channels, the CG matvec's roofline term."""
        hi = _HI if C.dtype == jnp.float32 else None
        acc = jnp.float32
        y = jnp.zeros(x.shape, acc)
        for k, d in enumerate(self.offsets):
            xr = jnp.roll(x, -d, axis=0)
            y = y + jnp.einsum('ntu,nu->nt', C[k], xr, precision=hi,
                               preferred_element_type=acc)
            back = jnp.einsum('ntu,nt->nu', C[k], x, precision=hi,
                              preferred_element_type=acc)
            y = y + jnp.roll(back, d, axis=0)
        return y  # f32 accumulation regardless of channel dtype

    def matvec(self, C, D, x):
        return jnp.einsum('ntu,nu->nt', D, x, precision=_HI) + \
            self.couple(C, x)
