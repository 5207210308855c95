r"""Interop with torch-based pipelines (migration aid).

Converts tensors and LieTensors at the framework boundary so existing
pypose/PyTorch data pipelines can feed pypose_tpu directly.  torch is an
optional dependency: these functions import it lazily.
"""

import numpy as np
import jax.numpy as jnp

from .lietensor import lietensor as _lt
from .lietensor.lietensor import LieTensor

_BY_NAME = {
    'SO3Type': _lt.SO3_type, 'so3Type': _lt.so3_type,
    'SE3Type': _lt.SE3_type, 'se3Type': _lt.se3_type,
    'Sim3Type': _lt.Sim3_type, 'sim3Type': _lt.sim3_type,
    'RxSO3Type': _lt.RxSO3_type, 'rxso3Type': _lt.rxso3_type,
}


def from_torch(x):
    """torch.Tensor -> jnp array; pypose.LieTensor -> pypose_tpu.LieTensor
    (matched by ltype class name)."""
    ltype = None
    if hasattr(x, 'ltype'):
        name = type(x.ltype).__name__
        ltype = _BY_NAME.get(name)
        if ltype is None:
            raise ValueError(f'Unknown ltype {name}')
    data = x.detach().cpu().numpy() if hasattr(x, 'detach') else \
        np.asarray(x)
    arr = jnp.asarray(data)
    return LieTensor(arr, ltype=ltype) if ltype is not None else arr


def to_torch(x):
    """jnp array / LieTensor -> torch.Tensor (CPU).  For LieTensors the
    raw storage is returned (rewrap with pypose on the torch side)."""
    import torch
    if isinstance(x, LieTensor):
        x = x.tensor()
    return torch.from_numpy(np.asarray(x).copy())
