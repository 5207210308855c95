r"""pypose_tpu: a TPU-native (JAX/XLA/Pallas) differentiable robotics library.

A ground-up re-design of the capabilities of pypose/pypose for TPU:
batched Lie-group tensors (SO3/SE3/Sim3/RxSO3 + algebras) with analytic
left-Jacobian AD rules, second-order nonlinear-least-squares optimizers
(Gauss-Newton, Levenberg-Marquardt, sparse factor-graph LM), and robotics
modules (Kalman/particle filters, IMU preintegration, LQR/MPC, EPnP, ICP,
splines, trajectory metrics) — all composable with ``jit``/``vmap``/
``grad`` and shardable over device meshes with ``shard_map``/``pjit``.

Usage mirrors the reference: ``import pypose_tpu as pp``.
"""

__version__ = '0.1.0'

from .nn import Parameter, Module
from .lietensor import (
    LieTensor, retain_ltype, seed,
    SO3_type, so3_type, SE3_type, se3_type,
    Sim3_type, sim3_type, RxSO3_type, rxso3_type,
    liegroup, liealgebra,
    randn_like, randn_SE3, randn_SO3, randn_so3, randn_se3,
    randn_Sim3, randn_sim3, randn_RxSO3, randn_rxso3,
    identity_like, identity_SO3, identity_so3, identity_SE3, identity_se3,
    identity_Sim3, identity_sim3, identity_RxSO3, identity_rxso3,
    SO3, so3, SE3, se3, Sim3, sim3, RxSO3, rxso3,
    Exp, Log, Inv, Mul, Retr, Act, Adj, AdjT, Jinvp, Jr,
    vec2skew, add, add_, mul, stack, cat, concat, split,
    tensor, translation, rotation, scale, matrix, euler, quat2unit,
    mat2SO3, mat2SE3, mat2Sim3, mat2RxSO3, from_matrix, euler2SO3,
)
from .basics import pm, cumops, cummul, cumprod, cumops_, cummul_, cumprod_
from .module.loss import geodesic_loss
from .sparse import bsr_bsc_matmul, bsr_matvec, dense_to_bsr, dense_to_bsc
from .function import (
    cart2homo, homo2cart, point2pixel, pixel2point, reprojerr, knn, svdtf,
    svdstf, nbr_filter, random_filter, voxel_filter, knn_filter,
    bvv, bmv, bvmv, chspline, bspline, is_lietensor, is_SE3, hasnan,
)

from . import lietensor  # noqa: F401
from . import basics     # noqa: F401
from . import testing    # noqa: F401
from . import function   # noqa: F401
from . import optim      # noqa: F401
from . import nn         # noqa: F401
from . import module     # noqa: F401
from . import utils      # noqa: F401
from . import datasets   # noqa: F401
from . import metric     # noqa: F401
from . import sparse     # noqa: F401
from . import func       # noqa: F401
from . import autograd   # noqa: F401
from . import interop    # noqa: F401
from . import parallel   # noqa: F401
from . import ops        # noqa: F401
