r"""Functional Jacobians over LieTensor-valued functions.

Ref: pypose/func/jac.py:6-58.  The reference wraps ``torch.func.jacrev`` in
``retain_ltype()`` so functorch transforms keep the ltype; here LieTensor is
a pytree node, so ``jax.jacrev``/``jacfwd`` preserve it by construction and
these are thin aliases (the ``retain_ltype`` context is a no-op kept for
API parity).
"""

import jax


def jacrev(func, argnums=0, *, has_aux=False, chunk_size=None,
           _preallocate_and_copy=False):
    """Reverse-mode Jacobian; LieTensor inputs keep their ltype.

    Gradients w.r.t. Lie-group arguments follow the left-perturbation
    convention (storage-shaped, zero tail) — see
    pypose_tpu.lietensor.operation.
    """
    return jax.jacrev(func, argnums=argnums, has_aux=has_aux)


def jacfwd(func, argnums=0, *, has_aux=False):
    """Forward-mode Jacobian (no reference analog needed: custom_jvp rules
    make every Lie op forward-differentiable)."""
    return jax.jacfwd(func, argnums=argnums, has_aux=has_aux)
