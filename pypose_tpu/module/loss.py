r"""Geodesic rotation loss.  Ref: pypose/module/loss.py."""

import jax.numpy as jnp

from ..nn import Module
from ..function.checking import is_lietensor


def geodesic_loss(input, target, reduction='mean'):
    r"""Rotation geodesic distance ||Log(x y^-1)||.  Ref: loss.py:6-38."""
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
