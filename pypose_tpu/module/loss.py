r"""Geodesic rotation loss.  Ref: pypose/module/loss.py."""

import jax.numpy as jnp

from ..nn import Module
from ..function.checking import is_lietensor


def geodesic_loss(input, target, reduction='mean'):
    r"""Rotation geodesic distance :math:`\|\mathrm{Log}(x\,y^{-1})\|`
    between the rotation parts of two group LieTensors, with
    'none' | 'mean' | 'sum' reduction.

    Ref: pypose/module/loss.py:6-38.

    Example:
        >>> import jax, pypose_tpu as pp
        >>> from pypose_tpu.module import geodesic_loss
        >>> q = pp.randn_SO3(4, key=jax.random.PRNGKey(0))
        >>> bool(geodesic_loss(q, q) < 1e-6)  # zero distance to itself
        True
    """
    assert is_lietensor(input) and is_lietensor(target), \
        'input should be LieTensor'
    assert reduction in ['none', 'mean', 'sum'], \
        'reduction type not supported'
    x, y = input.rotation(), target.rotation()
    e = x * y.Inv()
    if not e.ltype.on_manifold:
        e = e.Log()
    theta = jnp.linalg.norm(e.tensor(), axis=-1)
    if reduction == 'none':
        return theta
    elif reduction == 'mean':
        return theta.mean()
    return theta.sum()


class GeodesicLoss(Module):
    r"""Module wrapper of :func:`geodesic_loss`.  Ref: loss.py:41-83."""

    def __init__(self, reduction='mean'):
        super().__init__()
        self.reduction = reduction

    def forward(self, input, target):
        return geodesic_loss(input, target, self.reduction)
