"""Block-sparse ops property tests vs dense matmul over randomized block
patterns (incl. zero blocks).  Ref style: tests/sparse/test_bsr.py:29-40.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pypose_tpu.sparse import (dense_to_bsr, dense_to_bsc, bsr_to_dense,
                               bsr_bsc_matmul, bsr_matvec)


def random_block_dense(rng, nbr, nbc, bh, bw, density=0.4):
    mask = rng.random((nbr, nbc)) < density
    blocks = rng.normal(size=(nbr, nbc, bh, bw)) * mask[..., None, None]
    return blocks.transpose(0, 2, 1, 3).reshape(nbr * bh, nbc * bw)


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('bshape', [(2, 3, 4), (3, 3, 3), (1, 2, 1)])
def test_bsr_bsc_matmul_matches_dense(seed, bshape):
    bh, bk, bw = bshape
    rng = np.random.default_rng(seed)
    A = random_block_dense(rng, 4, 5, bh, bk)
    B = random_block_dense(rng, 5, 3, bk, bw)
    bsr = dense_to_bsr(A, (bh, bk))
    bsc = dense_to_bsc(B, (bk, bw))
    out = bsr_bsc_matmul(bsr, bsc)
    np.testing.assert_allclose(np.asarray(out), A @ B, atol=1e-5)


def test_bsr_roundtrip_and_matvec():
    rng = np.random.default_rng(3)
    A = random_block_dense(rng, 3, 4, 2, 2)
    bsr = dense_to_bsr(A, (2, 2))
    np.testing.assert_allclose(np.asarray(bsr_to_dense(bsr)), A, atol=1e-6)
    x = rng.normal(size=8)
    np.testing.assert_allclose(np.asarray(bsr_matvec(bsr, jnp.asarray(x))),
                               A @ x, atol=1e-5)


def test_all_zero_blocks():
    A = np.zeros((4, 6))
    B = np.zeros((6, 4))
    out = bsr_bsc_matmul(dense_to_bsr(A, (2, 2)), dense_to_bsc(B, (2, 2)))
    np.testing.assert_allclose(np.asarray(out), 0.0)
