r"""Iterative Closest Point.

Ref: pypose/module/icp.py.  knn -> Kabsch (svdtf) -> compose, under
ReduceToBason stepper semantics (utils/stepper.py:18-95).

TPU-native design: the reference iterates on the host, paying a
device->host sync per iteration (up to ``steps=200``); here the whole
loop runs as ONE ``lax.while_loop`` program, so the module is jittable,
vmap-able over batches of clouds, and costs a single host sync.
``lax.while_loop`` is not reverse-differentiable, so gradients use the
implicit fixed-point surrogate: at convergence the correspondences are
locally constant, and the returned transform differentiates through one
Kabsch solve on the converged matches (value is exactly the loop's
composition, straight-through).
"""

import jax
import jax.numpy as jnp

from ..nn import Module
from ..utils.stepper import ReduceToBason
from ..function.geometry import knn, svdtf
from ..function.checking import is_SE3
from ..lietensor.lietensor import LieTensor, SE3_type


class ICP(Module):
    r"""Batched Iterative Closest Point: returns the SE3 aligning
    ``source`` ``(*, N, 3)`` to ``target`` ``(*, M, 3)``.  Each sweep is
    nearest-neighbor association (:func:`pypose_tpu.knn`) + Kabsch
    (:func:`pypose_tpu.svdtf`); the stepper-controlled loop runs as one
    cached jitted ``lax.while_loop`` on device.

    Ref: pypose/module/icp.py:7-110 (forward :73).

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> from pypose_tpu.module import ICP
        >>> src = jax.random.normal(jax.random.PRNGKey(0), (60, 3))
        >>> T = pp.randn_SE3(sigma=(0.2, 0.1), key=jax.random.PRNGKey(1))
        >>> T_est = ICP()(src, T.Act(src))
        >>> err = (T_est.Inv() @ T).Log().tensor()
        >>> bool(jnp.abs(err).max() < 1e-2)
        True
    """

    def __init__(self, stepper=None, init=None):
        super().__init__()
        self.stepper = ReduceToBason(steps=200) if stepper is None \
            else stepper
        assert init is None or is_SE3(init), \
            'The initial transformation is not SE3Type.'
        self.init = init

    def forward(self, source, target, ord=2, dim=-1, init=None):
        temporal = source
        init = init if init is not None else self.init
        if init is not None:
            assert is_SE3(init), \
                'The initial transformation is not SE3Type LieTensor.'
            temporal = init.unsqueeze(-2) @ temporal
        batch = jnp.broadcast_shapes(source.shape[:-2], target.shape[:-2])
        if self.stepper.verbose:
            return self._forward_host(source, temporal, target, ord, dim,
                                      batch)
        # jit the whole loop once per (ord, dim) — fresh while_loop closures
        # would otherwise re-trace on every eager call
        if not hasattr(self, '_compiled'):
            self._compiled = {}
        key = (ord, dim)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                lambda s, tmp, tgt: self._core(s, tmp, tgt, ord, dim))
        out = self._compiled[key](source, temporal, target)
        return LieTensor(out, ltype=SE3_type)

    def _core(self, source, temporal, target, ord, dim):
        st = self.stepper
        batch = jnp.broadcast_shapes(source.shape[:-2], target.shape[:-2])
        targetb = jnp.broadcast_to(target, batch + target.shape[-2:])

        def cond(carry):
            return ~carry[-1]

        def body(carry):
            temp, last, steps, pat, _ = carry
            knndist, knnidx = knn(temp, target, k=1, ord=ord, dim=dim)
            error = knndist[..., 0].mean(axis=-1)
            idx = jnp.broadcast_to(knnidx[..., 0],
                                   batch + source.shape[-2:-1])
            knntarget = jnp.take_along_axis(targetb, idx[..., None],
                                            axis=-2)
            T = svdtf(temp, knntarget)
            temp = T.unsqueeze(-2) @ temp
            steps = steps + 1
            stop = jnp.all(error < st.tol) | (steps >= st.max_steps)
            plateau = jnp.all((last - error) / error < st.decreasing)
            pat = jnp.where(plateau, pat + 1, jnp.zeros_like(pat))
            stop = stop | (pat >= st.patience)
            return (temp, error, steps, pat, stop)

        last0 = jnp.full(batch, jnp.inf, dtype=temporal.dtype)
        i0 = jnp.asarray(0, jnp.int32)
        carry = (temporal, last0, i0, i0, jnp.asarray(False))
        aligned, _, _, _, _ = jax.lax.while_loop(cond, body, carry)
        aligned = jax.lax.stop_gradient(aligned)

        # value: exact composition of the loop; gradient: one Kabsch on the
        # converged correspondences (implicit fixed-point / straight-through)
        T_val = svdtf(source, aligned).tensor()
        _, knnidx = knn(aligned, target, k=1, ord=ord, dim=dim)
        idx = jax.lax.stop_gradient(
            jnp.broadcast_to(knnidx[..., 0], batch + source.shape[-2:-1]))
        knntarget = jnp.take_along_axis(targetb, idx[..., None], axis=-2)
        T_diff = svdtf(source, knntarget).tensor()
        return T_diff + jax.lax.stop_gradient(T_val - T_diff)

    def _forward_host(self, source, temporal, target, ord, dim, batch):
        """Host-loop fallback used when the stepper is verbose (prints
        per-iteration losses; one sync per iteration)."""
        self.stepper.reset()
        while self.stepper.continual():
            knndist, knnidx = knn(temporal, target, k=1, ord=ord, dim=dim)
            error = knndist[..., 0].mean(axis=-1)
            targetb = jnp.broadcast_to(target, batch + target.shape[-2:])
            idx = jnp.broadcast_to(knnidx[..., 0],
                                   batch + source.shape[-2:-1])
            knntarget = jnp.take_along_axis(targetb, idx[..., None], axis=-2)
            T = svdtf(temporal, knntarget)
            temporal = T.unsqueeze(-2) @ temporal
            self.stepper.step(error)
        return svdtf(source, temporal)
