r"""Model Jacobians w.r.t. parameter pytrees.

Ref: pypose/optim/functional.py.  ``jax.jacrev``/``jacfwd`` over the flat
parameter leaves replace ``torch.autograd.functional.jacobian`` +
``functional_call`` closures; ``vectorize=True`` is implicit (jacrev is
batched by construction).
"""

import jax
import jax.numpy as jnp

from ..nn import functional_call
from ..lietensor.lietensor import LieTensor


def _as_array(x):
    return x.tensor() if isinstance(x, LieTensor) else x


def _params_leaves(params):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    return leaves, treedef


def _residual_outputs(model, params, input):
    out = functional_call(model, params, input if input is not None else ())
    if isinstance(out, (tuple, list)):
        return tuple(_as_array(o) for o in out)
    return (_as_array(out),)


def modjac(model, input=None, flatten=False, **kwargs):
    r"""Jacobian of a model's output w.r.t. its parameters.

    Returns, per output, a matrix [output_i.size, total_param_size] (list),
    or their row-concatenation when ``flatten=True``.

    Ref: optim/functional.py:9-153 (vectorize/strategy kwargs accepted for
    API parity; jacrev is always vectorized).
    """
    params = model.parameters()
    leaves, treedef = _params_leaves(params)

    def func(leaves_):
        p = jax.tree_util.tree_unflatten(treedef, leaves_)
        return _residual_outputs(model, p, input)

    J = jax.jacrev(func)(leaves)
    outs = _residual_outputs(model, params, input)
    rows = []
    for Ji, oi in zip(J, outs):
        rows.append(jnp.concatenate(
            [jnp.reshape(j, (oi.size, l.size)) for j, l in zip(Ji, leaves)],
            axis=1))
    if not isinstance(rows[0], jnp.ndarray):  # pragma: no cover
        raise RuntimeError
    if flatten:
        return jnp.concatenate(rows, axis=0)
    return rows


def modjacrev(model, input, argnums=0, has_aux=False):
    """jacrev of model output w.r.t. the params dict.  Ref: functional.py:157."""
    params = model.parameters()

    def func(p, inp):
        return functional_call(model, p, inp)

    return jax.jacrev(func, argnums=argnums, has_aux=has_aux)(params, input)


def modjacfwd(model, input, argnums=0, has_aux=False):
    """jacfwd of model output w.r.t. the params dict.  Ref: functional.py:164."""
    params = model.parameters()

    def func(p, inp):
        return functional_call(model, p, inp)

    return jax.jacfwd(func, argnums=argnums, has_aux=has_aux)(params, input)
