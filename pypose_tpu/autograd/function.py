r"""Sparse-Jacobian declaration decorators (API parity).

Ref: pypose/autograd/function.py:51-84.  The reference's ``psjac`` marks a
batched row-independent residual so its external CUDA backend can record
gather indices and assemble block-sparse Jacobians at runtime.  On TPU the
sparsity of a factor graph is *static*, so the equivalent capability is
:class:`pypose_tpu.optim.sparse.SparseLM` + :class:`Factor`, where edge
index lists declare the structure up front and ``vmap(jacrev)`` produces
the blocks.  These decorators are therefore identity markers kept so
reference-style code imports cleanly.
"""

import functools


def parallel_for_sparse_jacobian(func):
    """Mark ``func`` as a batched, row-independent residual.

    Identity marker; use pypose_tpu.optim.sparse.SparseLM/Factor for the
    actual sparse path (the contract documented at reference
    autograd/function.py:7-49 — each batch row of the output depends only
    on the gathered inputs of that row — is exactly what a Factor encodes).
    """
    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        return func(*args, **kwargs)
    wrapper.__row_independent__ = True
    return wrapper


psjac = parallel_for_sparse_jacobian
