r"""Block-sparse matrix ops (BSR x BSC matmul, BSR matvec).

Ref: pypose/sparse/ops.py:7-102.  The reference's ``bsr_bsc_matmul`` builds
block-pair lists in a Python loop, runs one batched ``bmm``, and
scatter-adds into COO->CSR output.  The TPU-native version keeps the same
structure but makes the pair lists *static host-side metadata* (numpy, built
once from the sparsity pattern), so the device program is a single gather ->
batched-einsum -> segment-sum — the layout XLA maps best onto the MXU.
"""

from collections import namedtuple

import numpy as np

import jax
import jax.numpy as jnp

# values: [nnzb, bh, bw]; indices are static numpy metadata
BSR = namedtuple('BSR', ['crow_indices', 'col_indices', 'values', 'shape'])
BSC = namedtuple('BSC', ['ccol_indices', 'row_indices', 'values', 'shape'])


def dense_to_bsr(dense, blocksize):
    """Convert a dense matrix to BSR, dropping all-zero blocks."""
    dense = np.asarray(dense)
    H, W = dense.shape
    bh, bw = blocksize
    assert H % bh == 0 and W % bw == 0
    nbr, nbc = H // bh, W // bw
    blocks = dense.reshape(nbr, bh, nbc, bw).transpose(0, 2, 1, 3)
    nz = ~(blocks == 0).all(axis=(-1, -2))
    rows, cols = np.nonzero(nz)
    crow = np.zeros(nbr + 1, dtype=np.int64)
    np.add.at(crow, rows + 1, 1)
    crow = np.cumsum(crow)
    return BSR(crow, cols.astype(np.int64),
               jnp.asarray(blocks[rows, cols]), (H, W))


def dense_to_bsc(dense, blocksize):
    """Convert a dense matrix to BSC, dropping all-zero blocks."""
    dense = np.asarray(dense)
    H, W = dense.shape
    bh, bw = blocksize
    nbr, nbc = H // bh, W // bw
    blocks = dense.reshape(nbr, bh, nbc, bw).transpose(0, 2, 1, 3)
    nz = ~(blocks == 0).all(axis=(-1, -2))
    rows, cols = np.nonzero(nz)
    order = np.lexsort((rows, cols))
    rows, cols = rows[order], cols[order]
    ccol = np.zeros(nbc + 1, dtype=np.int64)
    np.add.at(ccol, cols + 1, 1)
    ccol = np.cumsum(ccol)
    return BSC(ccol, rows.astype(np.int64),
               jnp.asarray(blocks[rows, cols]), (H, W))


def bsr_to_dense(bsr):
    nnzb, bh, bw = bsr.values.shape
    H, W = bsr.shape
    nbr, nbc = H // bh, W // bw
    rows = np.repeat(np.arange(nbr), np.diff(bsr.crow_indices))
    out = jnp.zeros((nbr, nbc, bh, bw), dtype=bsr.values.dtype)
    out = out.at[rows, bsr.col_indices].set(bsr.values)
    return out.transpose(0, 2, 1, 3).reshape(H, W)


def bsr_bsc_matmul(bsr, bsc):
    """Block CSR x block CSC -> dense result.

    Pair lists (which A-block meets which B-block) are computed host-side
    from the static pattern; on device it is one gather + batched matmul +
    segment-sum.  Ref: sparse/ops.py:39-100.
    """
    assert bsr.shape[1] == bsc.shape[0], 'matrix-matrix shape invalid'
    bh = bsr.values.shape[1]
    bw = bsc.values.shape[2]
    H, W = bsr.shape[0], bsc.shape[1]
    nbr = H // bh
    nbc = W // bw
    a_rows = np.repeat(np.arange(nbr), np.diff(bsr.crow_indices))
    b_cols = np.repeat(np.arange(nbc), np.diff(bsc.ccol_indices))
    ai, bi, oi = [], [], []
    # inner-index match: A block (i, k) pairs with B block (k, j)
    from collections import defaultdict
    b_by_k = defaultdict(list)
    for idx, k in enumerate(bsc.row_indices):
        b_by_k[int(k)].append(idx)
    for idx_a, k in enumerate(bsr.col_indices):
        for idx_b in b_by_k.get(int(k), ()):
            ai.append(idx_a)
            bi.append(idx_b)
            oi.append(int(a_rows[idx_a]) * nbc + int(b_cols[idx_b]))
    if not ai:
        return jnp.zeros((H, W), dtype=bsr.values.dtype)
    ai = jnp.asarray(np.asarray(ai))
    bi = jnp.asarray(np.asarray(bi))
    oi = jnp.asarray(np.asarray(oi))
    prods = jnp.einsum('nij,njk->nik', bsr.values[ai], bsc.values[bi])
    out = jax.ops.segment_sum(prods, oi, num_segments=nbr * nbc) \
        if hasattr(jax.ops, 'segment_sum') else \
        jnp.zeros((nbr * nbc, bh, bw),
                  dtype=prods.dtype).at[oi].add(prods)
    out = out.reshape(nbr, nbc, bh, bw).transpose(0, 2, 1, 3)
    return out.reshape(H, W)


def bsr_matvec(bsr, x):
    """Block-sparse matrix-vector product (dense vector in/out)."""
    nnzb, bh, bw = bsr.values.shape
    H, W = bsr.shape
    nbr = H // bh
    rows = jnp.asarray(np.repeat(np.arange(nbr),
                                 np.diff(bsr.crow_indices)))
    xb = x.reshape(W // bw, bw)
    gathered = xb[jnp.asarray(bsr.col_indices)]
    prods = jnp.einsum('nij,nj->ni', bsr.values, gathered)
    out = jnp.zeros((nbr, bh), dtype=prods.dtype).at[rows].add(prods)
    return out.reshape(H)


def _sparse_csr_mm(a, b):
    """Layout dispatcher for parity with reference sparse/ops.py:7-35."""
    if isinstance(a, BSR) and isinstance(b, BSC):
        return bsr_bsc_matmul(a, b)
    raise NotImplementedError(
        'Only BSR x BSC is supported; convert with dense_to_bsr/bsc.')
