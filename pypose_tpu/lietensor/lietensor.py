r"""LieTensor: pytree-backed Lie-group/Lie-algebra tensor type for JAX on TPU.

TPU-native redesign of pypose's ``torch.Tensor``-subclass ``LieTensor``
(reference: pypose/lietensor/lietensor.py:778-1233).  JAX has no tensor
subclassing; instead ``LieTensor`` is a thin immutable wrapper registered as
a pytree node: the quaternion/translation storage array is the (traced)
child and the ``ltype`` is static aux data.  This single structural choice
replaces the reference's ``__torch_function__`` re-wrapping
(lietensor.py:950-968), ``generate_vmap_rule`` and ``retain_ltype``
machinery (lietensor.py:1339-1371) wholesale: ``jit``/``vmap``/``grad``/
``lax.scan`` traverse the pytree and preserve ``ltype`` by construction.

Storage layouts and the left-trivialized gradient convention match the
reference exactly; see :mod:`pypose_tpu.lietensor.operation`.
"""

from numbers import Number

import jax
import jax.numpy as jnp

from . import operation as op
from .jacobian import so3_Jl, vec2skew, cosc, sinc3, _theta


def pm(x):
    """Sign function returning +1 at 0.  Ref: pypose/basics/ops.py:4-24."""
    x = x.tensor() if isinstance(x, LieTensor) else jnp.asarray(x)
    return jnp.where(x >= 0, jnp.ones_like(x), -jnp.ones_like(x))


class LieType:
    """Per-group static metadata + op dispatch.  Ref: lietensor.py:37-193."""

    def __init__(self, name, dimension, embedding, manifold):
        self._name = name
        self._dimension = (dimension,)
        self._embedding = (embedding,)
        self._manifold = (manifold,)

    # -- static metadata ---------------------------------------------------
    @property
    def name(self):
        return self._name

    @property
    def dimension(self):
        return self._dimension

    @property
    def embedding(self):
        return self._embedding

    @property
    def manifold(self):
        return self._manifold

    @property
    def on_manifold(self):
        return self._dimension == self._manifold

    def __repr__(self):
        return self._name + "Type"

    # LieType singletons are pytree aux data: identity hash/eq is correct.

    # -- generic algebra behavior -------------------------------------------
    def add(self, input, other, alpha=1):
        if self.on_manifold:
            other = other.tensor() if isinstance(other, LieTensor) else other
            m = self._manifold[0]
            return LieTensor(
                input.tensor() + alpha * jnp.asarray(other)[..., :m],
                ltype=self)
        raise NotImplementedError("Instance has no add attribute.")

    def Log(self, X):
        raise AttributeError(f"{self} has no Log attribute")

    def Exp(self, x):
        raise AttributeError(f"{self} has no Exp attribute")

    def Inv(self, X):
        if self.on_manifold:
            return LieTensor(-X.tensor(), ltype=self)
        raise NotImplementedError("Instance has no Inv attribute.")

    def Act(self, X, p):
        raise AttributeError(f"{self} has no Act attribute")

    def Mul(self, X, Y):
        # (scalar or tensor) * algebra
        if self.on_manifold:
            Y = Y.tensor() if isinstance(Y, LieTensor) else Y
            return LieTensor(X.tensor() * Y, ltype=self)
        raise NotImplementedError('Invalid __mul__ operation')

    def Retr(self, X, a):
        if self.on_manifold:
            raise AttributeError("Has no Retr attribute")
        return a.Exp() * X

    def Adj(self, X, a):
        raise AttributeError(f"{self} has no Adj attribute")

    def AdjT(self, X, a):
        raise AttributeError(f"{self} has no AdjT attribute")

    def Jinvp(self, X, p):
        raise AttributeError(f"{self} has no Jinvp attribute")

    def Jr(self, X):
        raise NotImplementedError(f"{self} has no Jr attribute")

    def matrix(self, input):
        """To (*, 4, 4) matrix.  Ref: lietensor.py:123-128."""
        X = input.Exp() if self.on_manifold else input
        I = jnp.eye(4, dtype=X.dtype)
        I = I.reshape((1,) * len(X.lshape) + (4, 4))
        return jnp.swapaxes(X.unsqueeze(-2).Act(I), -1, -2)

    def rotation(self, input):
        raise NotImplementedError(
            "Rotation is not implemented for the instance.")

    def translation(self, input):
        return jnp.zeros(input.lshape + (3,), dtype=input.dtype)

    def scale(self, input):
        return jnp.ones(input.lshape + (1,), dtype=input.dtype)

    def identity(self, *size, dtype=jnp.float32):
        raise NotImplementedError("Instance has no identity.")

    def identity_like(self, X):
        return self.identity(*X.lshape, dtype=X.dtype)

    def randn(self, *size, sigma=1.0, key=None, dtype=jnp.float32):
        raise NotImplementedError("Instance has no randn method")

    def randn_like(self, X, sigma=1.0, key=None):
        return self.randn(*X.lshape, sigma=sigma, key=key, dtype=X.dtype)

    @staticmethod
    def to_tuple(size):
        out = ()
        for i in size:
            if isinstance(i, (tuple, list)):
                out += tuple(i)
            else:
                out += (i,)
        return out


def _data(x):
    return x.tensor() if isinstance(x, LieTensor) else jnp.asarray(x)


class _GroupType(LieType):
    """Shared dispatch for the four Lie-group types."""

    _OPS = {}  # name -> dict of raw-array functions; filled per subclass

    def __init__(self, name, dimension, manifold, algebra_getter, ops):
        super().__init__(name, dimension, dimension, manifold)
        self._algebra_getter = algebra_getter
        self._ops = ops

    @property
    def _algebra(self):
        return self._algebra_getter()

    def Log(self, X):
        return LieTensor(self._ops['Log'](_data(X)), ltype=self._algebra)

    def Act(self, X, p):
        p = _data(p)
        assert p.shape[-1] in (3, 4), "Invalid Tensor Dimension"
        fn = self._ops['Act'] if p.shape[-1] == 3 else self._ops['Act4']
        return fn(_data(X), p)

    def Mul(self, X, Y):
        Xd = _data(X)
        if isinstance(Y, LieTensor) and not Y.ltype.on_manifold:
            return LieTensor(self._ops['Mul'](Xd, Y.tensor()), ltype=self)
        if isinstance(Y, (jax.Array, jnp.ndarray)) or hasattr(Y, 'shape'):
            return self.Act(X, Y)
        raise NotImplementedError('Invalid __mul__ operation')

    def Inv(self, X):
        return LieTensor(self._ops['Inv'](_data(X)), ltype=self)

    def Adj(self, X, a):
        out = self._ops['AdjXa'](_data(X), _data(a))
        return LieTensor(out, ltype=self._algebra)

    def AdjT(self, X, a):
        out = self._ops['AdjTXa'](_data(X), _data(a))
        return LieTensor(out, ltype=self._algebra)

    def Jinvp(self, X, p):
        out = self._ops['Jinvp'](_data(X), _data(p))
        return LieTensor(out, ltype=self._algebra)

    def add(self, input, other, alpha=1):
        """Left-retraction: Exp(alpha * other[..., :m]) * input.

        Ref: SO3Type.add_ (lietensor.py:277-279) and basics.add.
        """
        other = _data(other)
        m = self._manifold[0]
        delta = LieTensor(alpha * other[..., :m], ltype=self._algebra)
        return delta.Exp() * input

    def randn(self, *size, sigma=1.0, key=None, dtype=jnp.float32):
        x = self._algebra.randn(*size, sigma=sigma, key=key, dtype=dtype)
        return self._algebra.Exp(x)

    def identity_like(self, X):
        return self.identity(*X.lshape, dtype=X.dtype)


class SO3Type(_GroupType):
    def __init__(self):
        ops = dict(Log=op.SO3_Log, Act=op.SO3_Act, Act4=op.SO3_Act4,
                   Mul=op.SO3_Mul, Inv=op.SO3_Inv, AdjXa=op.SO3_AdjXa,
                   AdjTXa=op.SO3_AdjTXa, Jinvp=op.SO3_Jinvp)
        super().__init__('SO3', 4, 3, lambda: so3_type, ops)

    def identity(self, *size, dtype=jnp.float32):
        size = self.to_tuple(size)
        data = jnp.array([0., 0., 0., 1.], dtype=dtype)
        return LieTensor(jnp.broadcast_to(data, size + (4,)), ltype=self)

    def matrix(self, input):
        """To (*, 3, 3) rotation matrix.  Ref: lietensor.py:281-285."""
        return op.SO3_Matrix(_data(input))

    def rotation(self, input):
        return input

    def Jr(self, X):
        """Right Jacobian of SO(3).  Ref: lietensor.py:296-300."""
        return X.Log().Jr()


class so3Type(LieType):
    def __init__(self):
        super().__init__('so3', 3, 4, 3)

    def Exp(self, x):
        return LieTensor(op.so3_Exp(_data(x)), ltype=SO3_type)

    def identity(self, *size, dtype=jnp.float32):
        size = self.to_tuple(size)
        return LieTensor(jnp.zeros(size + (3,), dtype=dtype), ltype=self)

    def randn(self, *size, sigma=1.0, key=None, dtype=jnp.float32):
        """Random axis x N(0, sigma) angle.  Ref: lietensor.py:323-331."""
        assert isinstance(sigma, Number), \
            'Only accepts sigma as a single number'
        size = self.to_tuple(size)
        k1, k2 = _split_key(key)
        data = jax.random.normal(k1, size + (3,), dtype=dtype)
        dist = jnp.linalg.norm(data, axis=-1, keepdims=True)
        dist = jnp.maximum(dist, jnp.finfo(dtype).tiny)
        theta = sigma * jax.random.normal(k2, size + (1,), dtype=dtype)
        return LieTensor(data / dist * theta, ltype=self)

    def matrix(self, input):
        return SO3_type.matrix(input.Exp())

    def rotation(self, input):
        return input.Exp().rotation()

    def Jr(self, x):
        """Right Jacobian of so(3): Jl(-x).  Ref: lietensor.py:343-351."""
        return so3_Jl(-_data(x))


class SE3Type(_GroupType):
    def __init__(self):
        ops = dict(Log=op.SE3_Log, Act=op.SE3_Act, Act4=op.SE3_Act4,
                   Mul=op.SE3_Mul, Inv=op.SE3_Inv, AdjXa=op.SE3_AdjXa,
                   AdjTXa=op.SE3_AdjTXa, Jinvp=op.SE3_Jinvp)
        super().__init__('SE3', 7, 6, lambda: se3_type, ops)

    def identity(self, *size, dtype=jnp.float32):
        size = self.to_tuple(size)
        data = jnp.array([0., 0., 0., 0., 0., 0., 1.], dtype=dtype)
        return LieTensor(jnp.broadcast_to(data, size + (7,)), ltype=self)

    def matrix(self, input):
        return op.SE3_Matrix(_data(input))

    def rotation(self, input):
        return LieTensor(_data(input)[..., 3:7], ltype=SO3_type)

    def translation(self, input):
        return _data(input)[..., 0:3]


class se3Type(LieType):
    def __init__(self):
        super().__init__('se3', 6, 7, 6)

    def Exp(self, x):
        return LieTensor(op.se3_Exp(_data(x)), ltype=SE3_type)

    def identity(self, *size, dtype=jnp.float32):
        size = self.to_tuple(size)
        return LieTensor(jnp.zeros(size + (6,), dtype=dtype), ltype=self)

    def randn(self, *size, sigma=1.0, key=None, dtype=jnp.float32):
        """Per-channel sigma support.  Ref: lietensor.py:473-491."""
        if not isinstance(sigma, (tuple, list)):
            sigma = (sigma,) * 4
        elif len(sigma) == 2:
            sigma = (sigma[0],) * 3 + (sigma[1],)
        else:
            assert len(sigma) == 4, \
                'Only accepts a tuple of sigma in size 1, 2, or 4.'
        size = self.to_tuple(size)
        k1, k2 = _split_key(key)
        rot = so3_type.randn(*size, sigma=sigma[-1], key=k1,
                             dtype=dtype).tensor()
        t_sigma = jnp.array(sigma[:3], dtype=dtype)
        trans = t_sigma * jax.random.normal(k2, size + (3,), dtype=dtype)
        return LieTensor(jnp.concatenate([trans, rot], axis=-1), ltype=self)

    def matrix(self, input):
        return SE3_type.matrix(input.Exp())

    def rotation(self, input):
        return input.Exp().rotation()

    def translation(self, input):
        return input.Exp().translation()


class Sim3Type(_GroupType):
    def __init__(self):
        ops = dict(Log=op.Sim3_Log, Act=op.Sim3_Act, Act4=op.Sim3_Act4,
                   Mul=op.Sim3_Mul, Inv=op.Sim3_Inv, AdjXa=op.Sim3_AdjXa,
                   AdjTXa=op.Sim3_AdjTXa, Jinvp=op.Sim3_Jinvp)
        super().__init__('Sim3', 8, 7, lambda: sim3_type, ops)

    def identity(self, *size, dtype=jnp.float32):
        size = self.to_tuple(size)
        data = jnp.array([0., 0., 0., 0., 0., 0., 1., 1.], dtype=dtype)
        return LieTensor(jnp.broadcast_to(data, size + (8,)), ltype=self)

    def matrix(self, input):
        return op.Sim3_Matrix(_data(input))

    def rotation(self, input):
        return LieTensor(_data(input)[..., 3:7], ltype=SO3_type)

    def translation(self, input):
        return _data(input)[..., 0:3]

    def scale(self, input):
        return _data(input)[..., 7:8]


class sim3Type(LieType):
    def __init__(self):
        super().__init__('sim3', 7, 8, 7)

    def Exp(self, x):
        return LieTensor(op.sim3_Exp(_data(x)), ltype=Sim3_type)

    def identity(self, *size, dtype=jnp.float32):
        size = self.to_tuple(size)
        return LieTensor(jnp.zeros(size + (7,), dtype=dtype), ltype=self)

    def randn(self, *size, sigma=1.0, key=None, dtype=jnp.float32):
        """Ref: lietensor.py:619-635."""
        if not isinstance(sigma, (tuple, list)):
            sigma = (sigma,) * 5
        elif len(sigma) == 3:
            sigma = (sigma[0],) * 3 + (sigma[1], sigma[2])
        else:
            assert len(sigma) == 5, \
                'Only accepts a tuple of sigma in size 1, 3, or 5.'
        size = self.to_tuple(size)
        k1, k2, k3 = _split_key(key, 3)
        rot = so3_type.randn(*size, sigma=sigma[-2], key=k1,
                             dtype=dtype).tensor()
        scale = sigma[-1] * jax.random.normal(k2, size + (1,), dtype=dtype)
        t_sigma = jnp.array(sigma[:3], dtype=dtype)
        trans = t_sigma * jax.random.normal(k3, size + (3,), dtype=dtype)
        return LieTensor(jnp.concatenate([trans, rot, scale], axis=-1),
                         ltype=self)

    def matrix(self, input):
        return Sim3_type.matrix(input.Exp())

    def rotation(self, input):
        return input.Exp().rotation()

    def translation(self, input):
        return input.Exp().translation()

    def scale(self, input):
        return input.Exp().scale()


class RxSO3Type(_GroupType):
    def __init__(self):
        ops = dict(Log=op.RxSO3_Log, Act=op.RxSO3_Act, Act4=op.RxSO3_Act4,
                   Mul=op.RxSO3_Mul, Inv=op.RxSO3_Inv, AdjXa=op.RxSO3_AdjXa,
                   AdjTXa=op.RxSO3_AdjTXa, Jinvp=op.RxSO3_Jinvp)
        super().__init__('RxSO3', 5, 4, lambda: rxso3_type, ops)

    def identity(self, *size, dtype=jnp.float32):
        size = self.to_tuple(size)
        data = jnp.array([0., 0., 0., 1., 1.], dtype=dtype)
        return LieTensor(jnp.broadcast_to(data, size + (5,)), ltype=self)

    def matrix(self, input):
        return op.RxSO3_Matrix(_data(input))

    def rotation(self, input):
        return LieTensor(_data(input)[..., 0:4], ltype=SO3_type)

    def scale(self, input):
        return _data(input)[..., 4:5]


class rxso3Type(LieType):
    def __init__(self):
        super().__init__('rxso3', 4, 5, 4)

    def Exp(self, x):
        return LieTensor(op.rxso3_Exp(_data(x)), ltype=RxSO3_type)

    def identity(self, *size, dtype=jnp.float32):
        size = self.to_tuple(size)
        return LieTensor(jnp.zeros(size + (4,), dtype=dtype), ltype=self)

    def randn(self, *size, sigma=1.0, key=None, dtype=jnp.float32):
        """Ref: lietensor.py:757-768."""
        if not isinstance(sigma, (tuple, list)):
            sigma = (sigma, sigma)
        else:
            assert len(sigma) == 2, \
                'Only accepts a tuple of sigma in size 1 or 2.'
        size = self.to_tuple(size)
        k1, k2 = _split_key(key)
        rot = so3_type.randn(*size, sigma=sigma[0], key=k1,
                             dtype=dtype).tensor()
        scale = sigma[1] * jax.random.normal(k2, size + (1,), dtype=dtype)
        return LieTensor(jnp.concatenate([rot, scale], axis=-1), ltype=self)

    def matrix(self, input):
        return RxSO3_type.matrix(input.Exp())

    def rotation(self, input):
        return input.Exp().rotation()

    def scale(self, input):
        return input.Exp().scale()


SO3_type, so3_type = SO3Type(), so3Type()
SE3_type, se3_type = SE3Type(), se3Type()
Sim3_type, sim3_type = Sim3Type(), sim3Type()
RxSO3_type, rxso3_type = RxSO3Type(), rxso3Type()
liegroup = [SO3_type, SE3_type, Sim3_type, RxSO3_type]
liealgebra = [so3_type, se3_type, sim3_type, rxso3_type]


# ---------------------------------------------------------------------------
# default PRNG stream (ergonomic parity with torch's global generator)
# ---------------------------------------------------------------------------

_DEFAULT_KEY = [jax.random.PRNGKey(0)]


def seed(n):
    """Reset the global PRNG stream used when ``key=None``."""
    _DEFAULT_KEY[0] = jax.random.PRNGKey(n)


def _next_key():
    _DEFAULT_KEY[0], sub = jax.random.split(_DEFAULT_KEY[0])
    return sub


def _split_key(key, num=2):
    if key is None:
        key = _next_key()
    return jax.random.split(key, num)


# ---------------------------------------------------------------------------
# LieTensor
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class LieTensor:
    r"""Lie-group / Lie-algebra tensor backed by a jnp array.

    The last dimension is the group storage (see
    :mod:`pypose_tpu.lietensor.operation` for layouts); all leading
    dimensions are batch dimensions.  Registered as a JAX pytree node, so it
    passes transparently through ``jit``/``vmap``/``grad``/``lax``-control
    flow with ``ltype`` preserved (this replaces the reference's
    ``__torch_function__`` wrapping, lietensor.py:950-968).

    Gradients of group-valued LieTensors follow the reference's left
    perturbation convention: ``jax.grad`` w.r.t. an SE3 returns a (*, 7)
    array whose first 6 entries are the left-tangent gradient and whose
    last entry is 0.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> X = pp.randn_SE3(2, key=jax.random.PRNGKey(0))
        >>> X.lshape, X.shape                 # batch shape vs storage shape
        ((2,), (2, 7))
        >>> I = X @ X.Inv()                   # X * X^-1 == identity
        >>> bool(jnp.allclose(I.Log().tensor(), 0., atol=1e-6))
        True

        LieTensors flow through JAX transforms with ltype preserved:

        >>> f = jax.jit(jax.vmap(lambda T: T.Act(jnp.ones(3))))
        >>> f(X).shape
        (2, 3)

        Gradient w.r.t. a group element is the left-trivialized tangent
        in storage shape (last channel zero):

        >>> g = jax.grad(lambda T: T.Act(jnp.ones(3)).sum())(X[0])
        >>> g.tensor().shape, float(g.tensor()[-1])
        ((7,), 0.0)
    """

    __slots__ = ('_data', '_ltype')

    def __init__(self, data, ltype=None, **kwargs):
        if isinstance(data, LieTensor):
            ltype = data.ltype if ltype is None else ltype
            data = data.tensor()
        if ltype is None:
            raise ValueError('ltype must be provided')
        data = jnp.asarray(data, **kwargs)
        self._data = data
        self._ltype = ltype

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self._data,), self._ltype

    @classmethod
    def tree_unflatten(cls, ltype, children):
        obj = object.__new__(cls)
        obj._data = children[0]
        obj._ltype = ltype
        return obj

    @classmethod
    def _fast(cls, data, ltype):
        obj = object.__new__(cls)
        obj._data = data
        obj._ltype = ltype
        return obj

    # -- basic properties ---------------------------------------------------
    @property
    def ltype(self):
        return self._ltype

    @property
    def shape(self):
        return self._data.shape

    @property
    def lshape(self):
        """Shape with the storage dimension hidden.  Ref: lietensor.py:970."""
        return self._data.shape[:-1]

    @property
    def dtype(self):
        return self._data.dtype

    @property
    def ndim(self):
        return self._data.ndim

    def __len__(self):
        return self._data.shape[0]

    def dim(self):
        return self._data.ndim

    def numel(self):
        return self._data.size

    @property
    def size(self):
        return self._data.size

    def tensor(self):
        """Underlying storage array.  Ref: lietensor.py:1119-1123."""
        return self._data

    def __jax_array__(self):
        return self._data

    def numpy(self):
        import numpy as np
        return np.asarray(self._data)

    def __repr__(self):
        return f'{self._ltype} LieTensor:\n{self._data}'

    # -- dtype / conversion --------------------------------------------------
    def astype(self, dtype):
        return LieTensor._fast(self._data.astype(dtype), self._ltype)

    def float(self):
        return self.astype(jnp.float32)

    def double(self):
        return self.astype(jnp.float64)

    def to(self, dtype=None):
        return self if dtype is None else self.astype(dtype)

    def clone(self):
        return LieTensor._fast(self._data, self._ltype)

    def detach(self):
        return LieTensor._fast(jax.lax.stop_gradient(self._data), self._ltype)

    # -- shape manipulation (batch dims) --------------------------------------
    def _wrap(self, data):
        return LieTensor._fast(data, self._ltype)

    def __getitem__(self, key):
        return self._wrap(self._data[key])

    def reshape(self, *shape):
        shape = LieType.to_tuple(shape)
        return self._wrap(self._data.reshape(shape))

    def view(self, *shape):
        return self.reshape(*shape)

    def lview(self, *shape):
        """Reshape batch dims only.  Ref: lietensor.py:996-1020."""
        shape = LieType.to_tuple(shape)
        return self._wrap(self._data.reshape(shape + self._ltype.dimension))

    def unsqueeze(self, dim):
        return self._wrap(jnp.expand_dims(self._data, dim))

    def squeeze(self, dim=None):
        return self._wrap(jnp.squeeze(self._data, dim))

    def expand(self, *shape):
        shape = LieType.to_tuple(shape)
        return self._wrap(jnp.broadcast_to(self._data, shape))

    def broadcast_to(self, shape):
        return self._wrap(jnp.broadcast_to(self._data, tuple(shape)))

    def tile(self, reps):
        return self._wrap(jnp.tile(self._data, tuple(reps) + (1,)))

    def flatten(self, start=0, end=-2):
        data = self._data
        nd = data.ndim
        end = end % nd
        shape = data.shape[:start] + (-1,) + data.shape[end + 1:]
        return self._wrap(data.reshape(shape))

    def swapaxes(self, a, b):
        return self._wrap(jnp.swapaxes(self._data, a, b))

    # -- Lie operations -------------------------------------------------------
    def Exp(self):
        return self._ltype.Exp(self)

    def Log(self):
        return self._ltype.Log(self)

    def Inv(self):
        return self._ltype.Inv(self)

    def Act(self, p):
        return self._ltype.Act(self, p)

    def Adj(self, a):
        return self._ltype.Adj(self, a)

    def AdjT(self, a):
        return self._ltype.AdjT(self, a)

    def Jinvp(self, p):
        return self._ltype.Jinvp(self, p)

    def Jr(self):
        return self._ltype.Jr(self)

    def Retr(self, a):
        return self._ltype.Retr(self, a)

    def add(self, other, alpha=1):
        return self._ltype.add(self, other, alpha)

    def mul(self, other):
        return self._ltype.Mul(self, other)

    def matrix(self):
        return self._ltype.matrix(self)

    def rotation(self):
        return self._ltype.rotation(self)

    def translation(self):
        return self._ltype.translation(self)

    def scale(self):
        return self._ltype.scale(self)

    def identity_like(self):
        return self._ltype.identity_like(self)

    def euler(self, eps=2e-4):
        """Quaternion -> RPY with gimbal-lock guard.  Ref: lietensor.py:1147-1173."""
        data = self.rotation().tensor()
        x, y = data[..., 0], data[..., 1]
        z, w = data[..., 2], data[..., 3]
        xx, yy, zz, ww = x * x, y * y, z * z, w * w

        t0 = 2 * (w * x + y * z)
        t1 = (ww + zz) - (xx + yy)
        t2 = 2 * (w * y - z * x) / (xx + yy + zz + ww)
        t3 = 2 * (w * z + x * y)
        t4 = (ww + xx) - (yy + zz)

        flag = jnp.abs(t2) < 1. - eps
        roll = jnp.where(flag, jnp.arctan2(t0, t1), jnp.zeros_like(t0))
        pitch = jnp.arcsin(jnp.clip(t2, -1, 1))
        yaw = jnp.where(flag, jnp.arctan2(t3, t4),
                        -2 * pm(t2) * jnp.arctan2(x, w))
        return jnp.stack([roll, pitch, yaw], axis=-1)

    # -- operators -------------------------------------------------------------
    def __add__(self, other):
        return self.add(other)

    def __mul__(self, other):
        return self._ltype.Mul(self, other)

    def __rmul__(self, other):
        if self._ltype.on_manifold and isinstance(other, Number):
            return self._ltype.Mul(self, other)
        raise NotImplementedError('Invalid __rmul__ operation')

    def __matmul__(self, other):
        if isinstance(other, LieTensor):
            return self._ltype.Mul(self, other)
        return self.Act(other)

    def __neg__(self):
        if self._ltype.on_manifold:
            return self._wrap(-self._data)
        raise NotImplementedError('Lie Group has no __neg__; use Inv()')

    def __eq__(self, other):
        if isinstance(other, LieTensor):
            return (self._ltype is other._ltype) and \
                jnp.array_equal(self._data, other._data)
        return NotImplemented

    def __hash__(self):
        return id(self)

    # -- cumulative ops ----------------------------------------------------------
    def cumprod(self, dim, left=True):
        from ..basics.ops import cumprod
        return cumprod(self, dim, left)

    def cummul(self, dim, left=True):
        from ..basics.ops import cummul
        return cummul(self, dim, left)

    def cumops(self, dim, ops):
        from ..basics.ops import cumops
        return cumops(self, dim, ops)

    # In-place variants (reference lietensor.py add_/cumprod_/cummul_/
    # cumops_/identity_): JAX arrays are immutable, so these return the new
    # value instead of mutating — rebind the result (``x = x.add_(a)``).
    def add_(self, other, alpha=1):
        return self.add(other, alpha)

    def cumprod_(self, dim, left=True):
        return self.cumprod(dim, left)

    def cummul_(self, dim, left=True):
        return self.cummul(dim, left)

    def cumops_(self, dim, ops):
        return self.cumops(dim, ops)

    def identity_(self):
        return self._ltype.identity_like(self)


def retain_ltype():
    """No-op context manager for API parity.

    The reference needs this to keep ``ltype`` alive under functorch
    transforms (lietensor.py:1339-1371); pytree registration makes it
    unnecessary here.
    """
    import contextlib
    return contextlib.nullcontext()
