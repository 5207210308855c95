r"""Fused nearest-neighbor (k=1) Pallas kernel.

The XLA tiled-knn path (function/geometry.py:_knn_tiled) materializes
every [chunk, N] squared-distance tile in HBM before reducing it —
R x N x 4 bytes per sweep (40 GB for 100k x 100k), which made ICP's
association ~120 ms/sweep on one v5e.  This kernel computes each
[Tr, Tn] distance block in VMEM via three outer products (the Gram
cross-term) and folds the min/argmin into a running per-row best, so
the only HBM traffic is the point clouds themselves (re-read per tile
pair: ~(R/Tr + N/Tn) x cloud bytes) and the [R] outputs.

Distances use the f32 Gram form |a|^2 + |b|^2 - 2 a.b, matching
_knn_tiled's accuracy tradeoff.
"""

import functools

import jax
import jax.numpy as jnp


def _knn1_kernel(ref_ref, nbr_ref, refsq_ref, nbrsq_ref, val_ref, idx_ref,
                 *, tn):
    import jax.experimental.pallas as pl
    j = pl.program_id(1)
    r = ref_ref[:]                                    # [Tr, D]
    n = nbr_ref[:]                                    # [Tn, D]
    cross = jnp.zeros((r.shape[0], n.shape[0]), r.dtype)
    for c in range(r.shape[1]):
        cross = cross + r[:, c][:, None] * n[:, c][None, :]
    # row vectors travel as [1, T] blocks (a bare (T,) block requires
    # T % 1024 == 0 to match XLA's 1-D T(1024) tiling — measured Mosaic
    # layout-verification failure at tr=512 on a real chip)
    d2 = refsq_ref[0][:, None] + nbrsq_ref[0][None, :] - 2.0 * cross
    local_val = jnp.min(d2, axis=1)
    local_idx = (jnp.argmin(d2, axis=1) + j * tn).astype(jnp.int32)

    @pl.when(j == 0)
    def _():
        val_ref[0, :] = local_val
        idx_ref[0, :] = local_idx

    @pl.when(j > 0)
    def _():
        better = local_val < val_ref[0, :]
        val_ref[0, :] = jnp.where(better, local_val, val_ref[0, :])
        idx_ref[0, :] = jnp.where(better, local_idx, idx_ref[0, :])


def _knnk_kernel(ref_ref, nbr_ref, refsq_ref, nbrsq_ref, val_ref, idx_ref,
                 *, tn, k):
    """Running top-k merge: per [Tr, Tn] tile, extract the k smallest
    distances by k min/argmin/mask passes (VMEM-resident), then merge
    with the running [k, Tr] best via unrolled first-occurrence
    selection (2k rows — no sort/top_k primitive needed in Mosaic)."""
    import jax.experimental.pallas as pl
    j = pl.program_id(1)
    r = ref_ref[:]                                    # [Tr, D]
    n = nbr_ref[:]                                    # [Tn, D]
    cross = jnp.zeros((r.shape[0], n.shape[0]), r.dtype)
    for c in range(r.shape[1]):
        cross = cross + r[:, c][:, None] * n[:, c][None, :]
    d2 = refsq_ref[0][:, None] + nbrsq_ref[0][None, :] - 2.0 * cross
    inf = jnp.asarray(jnp.inf, d2.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    lv, li = [], []
    for _ in range(k):
        a = jnp.argmin(d2, axis=1)                    # [Tr]
        lv.append(jnp.min(d2, axis=1))
        li.append((a + j * tn).astype(jnp.int32))
        d2 = jnp.where(col == a[:, None], inf, d2)    # mask the winner

    @pl.when(j == 0)
    def _():
        for s in range(k):
            val_ref[s, :] = lv[s]
            idx_ref[s, :] = li[s]

    @pl.when(j > 0)
    def _():
        cand_v = [val_ref[s, :] for s in range(k)] + lv
        cand_i = [idx_ref[s, :] for s in range(k)] + li
        for s in range(k):
            m = cand_v[0]
            for row in range(1, 2 * k):
                m = jnp.minimum(m, cand_v[row])
            taken = jnp.zeros_like(m, jnp.bool_)
            sel = jnp.zeros_like(cand_i[0])
            for row in range(2 * k):
                hit = (cand_v[row] == m) & ~taken
                sel = jnp.where(hit, cand_i[row], sel)
                cand_v[row] = jnp.where(hit, inf, cand_v[row])
                taken = taken | hit
            val_ref[s, :] = m
            idx_ref[s, :] = sel


def nnk(ref, nbr, k, tr=512, tn=2048, interpret=False):
    """k nearest ``nbr`` rows for each ``ref`` row, ascending; returns
    (d2 [R, k], idx [R, k]).  Same fused tiling as :func:`nn1`: distance
    tiles never touch HBM (the XLA lax.map path materializes R x N x 4
    bytes per sweep).  Per-tile cost adds ~k min/argmin passes over the
    VMEM block plus an O(k^2) unrolled merge on [Tr] vectors.

    MEASURED NEGATIVE for k > 1 (v5e, 100k x 100k, r5,
    tools/nnk_hw_check.py + nnk_xla_contrast.py): k=4 runs 429 ms vs
    317 ms for the XLA lax.map/top_k path (k=1: 84 vs ~317 ms — the
    k=1 win stands).  The k serial extraction passes are VPU-bound and
    scale linearly in k, while XLA's fused top_k amortizes its sort
    over the streamed [chunk, N] tile; the HBM traffic the kernel
    saves is already hidden by XLA's pipelining at these shapes.
    ``knn`` therefore routes only k == 1 here
    (function/geometry.py:_knn_tiled); the k > 1 kernel stays for
    completeness/interpret-mode study.  Ref capability:
    pypose/function/geometry.py:228 (torch.topk over the dense
    distance matrix)."""
    import jax.experimental.pallas as pl

    if k == 1:
        d2, idx = nn1(ref, nbr, tr=tr, tn=tn, interpret=interpret)
        return d2[:, None], idx[:, None]
    R, D = ref.shape
    N = nbr.shape[0]
    if k > N:
        raise ValueError(f'k={k} > number of neighbors {N}')
    tr = min(tr, max(8, R))
    tn = min(tn, max(128, N))
    padr = (-R) % tr
    padn = (-N) % tn
    refp = jnp.pad(ref, ((0, padr), (0, 0)))
    nbrp = jnp.pad(nbr, ((0, padn), (0, 0)))
    refsq = jnp.sum(refp * refp, axis=-1)[None, :]
    nbrsq = jnp.sum(nbrp * nbrp, axis=-1)[None, :]
    if padn:
        nbrsq = nbrsq.at[0, N:].set(jnp.inf)
    Rp, Np = R + padr, N + padn

    val, idx = pl.pallas_call(
        functools.partial(_knnk_kernel, tn=tn, k=int(k)),
        grid=(Rp // tr, Np // tn),
        in_specs=[
            pl.BlockSpec((tr, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, D), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tr), lambda i, j: (0, i)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
        ],
        out_specs=(pl.BlockSpec((k, tr), lambda i, j: (0, i)),
                   pl.BlockSpec((k, tr), lambda i, j: (0, i))),
        out_shape=(jax.ShapeDtypeStruct((k, Rp), ref.dtype),
                   jax.ShapeDtypeStruct((k, Rp), jnp.int32)),
        interpret=interpret,
    )(refp, nbrp, refsq, nbrsq)
    return jnp.maximum(val[:, :R].T, 0.0), idx[:, :R].T


def nn1(ref, nbr, tr=512, tn=2048, interpret=False):
    """Index of and squared distance to the nearest ``nbr`` row for each
    ``ref`` row.  Returns (d2 [R], idx [R])."""
    import jax.experimental.pallas as pl

    R, D = ref.shape
    N = nbr.shape[0]
    tr = min(tr, max(8, R))
    tn = min(tn, max(128, N))
    padr = (-R) % tr
    padn = (-N) % tn
    refp = jnp.pad(ref, ((0, padr), (0, 0)))
    nbrp = jnp.pad(nbr, ((0, padn), (0, 0)))
    refsq = jnp.sum(refp * refp, axis=-1)[None, :]    # [1, Rp]
    nbrsq = jnp.sum(nbrp * nbrp, axis=-1)[None, :]    # [1, Np]
    if padn:
        # padded neighbor rows must never win
        nbrsq = nbrsq.at[0, N:].set(jnp.inf)
    Rp, Np = R + padr, N + padn

    val, idx = pl.pallas_call(
        functools.partial(_knn1_kernel, tn=tn),
        grid=(Rp // tr, Np // tn),
        in_specs=[
            pl.BlockSpec((tr, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, D), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tr), lambda i, j: (0, i)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
        ],
        out_specs=(pl.BlockSpec((1, tr), lambda i, j: (0, i)),
                   pl.BlockSpec((1, tr), lambda i, j: (0, i))),
        out_shape=(jax.ShapeDtypeStruct((1, Rp), ref.dtype),
                   jax.ShapeDtypeStruct((1, Rp), jnp.int32)),
        interpret=interpret,
    )(refp, nbrp, refsq, nbrsq)
    return jnp.maximum(val[0, :R], 0.0), idx[0, :R]
