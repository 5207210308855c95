r"""Minimal module system for parameterized models on JAX.

The reference builds on ``torch.nn.Module`` + ``torch.func.functional_call``
(optim/functional.py:9-153).  Here a :class:`Module` is a plain Python object
that *records* which attributes are parameters (assigned via
:func:`Parameter`) and exposes them as a flat dict pytree;
:func:`functional_call` temporarily rebinds those attributes to candidate
(traced) values so optimizers can differentiate ``model.forward`` w.r.t. the
parameter pytree under ``jit``/``jacrev``.  Arrays are immutable, so
"in-place" parameter updates rebind attributes — the idiomatic JAX analog of
``param.add_``.
"""

import jax
import jax.numpy as jnp

from .lietensor.lietensor import LieTensor


class _EuclideanParameter:
    """Assignment-time marker wrapping a raw array parameter."""

    __slots__ = ('value',)

    def __init__(self, value):
        self.value = jnp.asarray(value)


@jax.tree_util.register_pytree_node_class
class Parameter(LieTensor):
    """LieTensor marked as an optimizable parameter.

    ``Parameter(lietensor)`` keeps the ltype; ``Parameter(array)`` returns an
    assignment-time marker that :class:`Module` unwraps into a plain array
    attribute registered as a parameter.

    Ref: pypose/lietensor/lietensor.py:1236-1337 (without the ``sjac``
    tracking machinery — sparse-Jacobian structure is static in JAX; see
    pypose_tpu.optim).
    """

    def __new__(cls, data=None, ltype=None, **kwargs):
        if not isinstance(data, LieTensor) and ltype is None:
            return _EuclideanParameter(data)
        return object.__new__(cls)

    @property
    def requires_grad(self):
        return True


class Module:
    """Base class for parameterized models.  Ref analog: torch.nn.Module."""

    def __init__(self):
        object.__setattr__(self, '_param_names', [])
        object.__setattr__(self, '_buffer_names', [])
        object.__setattr__(self, '_module_names', [])

    def _ensure_init(self):
        if not hasattr(self, '_param_names'):
            Module.__init__(self)

    def __setattr__(self, name, value):
        self._ensure_init()
        if isinstance(value, _EuclideanParameter):
            if name not in self._param_names:
                self._param_names.append(name)
            object.__setattr__(self, name, value.value)
            return
        if isinstance(value, Parameter):
            if name not in self._param_names:
                self._param_names.append(name)
        elif isinstance(value, Module):
            if name not in self._module_names:
                self._module_names.append(name)
        object.__setattr__(self, name, value)

    def register_buffer(self, name, value):
        self._ensure_init()
        if name not in self._buffer_names:
            self._buffer_names.append(name)
        object.__setattr__(self, name, value)

    def register_parameter(self, name, value):
        self._ensure_init()
        if name not in self._param_names:
            self._param_names.append(name)
        object.__setattr__(self, name, value)

    # -- traversal -----------------------------------------------------------
    def named_parameters(self, prefix=''):
        self._ensure_init()
        for n in self._param_names:
            yield prefix + n, getattr(self, n)
        for m in self._module_names:
            sub = getattr(self, m)
            yield from sub.named_parameters(prefix=prefix + m + '.')

    def parameters(self):
        return dict(self.named_parameters())

    def named_buffers(self, prefix=''):
        self._ensure_init()
        for n in self._buffer_names:
            yield prefix + n, getattr(self, n)
        for m in self._module_names:
            sub = getattr(self, m)
            yield from sub.named_buffers(prefix=prefix + m + '.')

    def buffers(self):
        return dict(self.named_buffers())

    def _set_by_path(self, path, value):
        obj = self
        parts = path.split('.')
        for p in parts[:-1]:
            obj = getattr(obj, p)
        object.__setattr__(obj, parts[-1], value)

    def load_parameters(self, params):
        """Rebind parameter attributes from a name->value dict."""
        for k, v in params.items():
            self._set_by_path(k, v)

    def forward(self, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)


class _swap_params:
    """Temporarily rebind parameters (trace-safe functional_call core)."""

    def __init__(self, module, params):
        self.module = module
        self.params = params

    def __enter__(self):
        self.saved = {k: None for k in self.params}
        for k in self.params:
            obj = self.module
            for p in k.split('.')[:-1]:
                obj = getattr(obj, p)
            self.saved[k] = getattr(obj, k.split('.')[-1])
        for k, v in self.params.items():
            self.module._set_by_path(k, v)
        return self.module

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            self.module._set_by_path(k, v)
        return False


def functional_call(module, params, args=(), kwargs=None):
    """Call ``module`` with ``params`` swapped in (restored afterwards).

    Ref: torch.func.functional_call usage in optim/functional.py:130-143.
    """
    kwargs = kwargs or {}
    if not isinstance(args, (tuple, list)):
        args = (args,)
    with _swap_params(module, params):
        return module(*args, **kwargs)
