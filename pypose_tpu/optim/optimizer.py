r"""Second-order NLS optimizers: Gauss-Newton and Levenberg-Marquardt.

Ref: pypose/optim/optimizer.py.  Architecture differences for TPU:

* each ``.step`` is ONE jitted XLA program: residuals -> jacrev ->
  corrector -> weighted normal equations -> solve -> manifold retraction;
* LM's data-dependent inner reject loop (optimizer.py:662-679) becomes a
  ``lax.while_loop`` carrying (params, loss, strategy-state, reject-count),
  so damping retries never leave the device;
* parameters are a name->value pytree; LieTensor parameters update by left
  retraction ``Exp(step) * X`` exactly like the reference's ``add_``
  (lietensor.py:442-444), Euclidean ones by plain addition.
"""

import numpy as np

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

from ..lietensor.lietensor import LieTensor
from ..nn import functional_call
from .corrector import Trivial, FastTriggs
from .solver import PINV, Cholesky
from .strategy import TrustRegion


def _as_array(x):
    return x.tensor() if isinstance(x, LieTensor) else x


class RobustModel:
    """Residual + kernelized-loss wrapper.  Ref: optimizer.py:64-125."""

    def __init__(self, model, kernel=None):
        self.model = model
        if kernel is None:
            self.kernel = [Trivial()]
        else:
            kernel = kernel if isinstance(kernel, (tuple, list)) else [kernel]
            self.kernel = [k if k is not None else Trivial() for k in kernel]

    @staticmethod
    def _args(input):
        if isinstance(input, dict):
            return (), input
        if isinstance(input, (tuple, list)):
            return tuple(input), {}
        return (input,), {}

    def forward(self, params, input, target=None):
        args, kwargs = self._args(input)
        output = functional_call(self.model, params, args, kwargs)
        return self.residuals(output, target)

    def residuals(self, outputs, targets):
        if isinstance(outputs, (tuple, list)):
            targets = [None] * len(outputs) if targets is None else targets
            return tuple(self.residual(o, targets[i])
                         for i, o in enumerate(outputs))
        return (self.residual(outputs, targets),)

    def residual(self, output, target):
        output = _as_array(output)
        return output if target is None else output - _as_array(target)

    def loss(self, params, input, target=None):
        """Scalar kernelized loss: sum_i k_i(||r_i||^2).sum().

        Ref: optimizer.py:117-125.
        """
        R = self.forward(params, input, target)
        if len(self.kernel) > 1:
            terms = [jnp.sum(k(jnp.sum(r * r, -1)))
                     for k, r in zip(self.kernel, R)]
        else:
            terms = [jnp.sum(self.kernel[0](jnp.sum(r * r, -1))) for r in R]
        return sum(terms)


def _update_parameters(params, step):
    """Split a flat step over param leaves; retraction for LieTensors.

    Ref: optimizer.py:135-140 (update_parameter).
    """
    keys = sorted(params.keys())
    sizes = [np.prod(params[k].shape, dtype=int) for k in keys]
    offsets = np.cumsum([0] + sizes)
    flat = step.reshape(-1)
    out = {}
    for k, o, s in zip(keys, offsets[:-1], sizes):
        p = params[k]
        d = flat[o:o + s].reshape(p.shape)
        if isinstance(p, LieTensor):
            new = p.add(d)
            # preserve the Parameter wrapper so pytree structure is stable
            # across lax.while_loop iterations
            if type(new) is not type(p):
                new = type(p)(new)
            out[k] = new
        else:
            out[k] = p + d
    return out


def _apply_weight(weight, R_list, J_list):
    """Apply block weights W to residuals/Jacobians without materializing
    the big block-diagonal matrix (reference: optimizer.py:80-95 builds
    ``torch.block_diag``; here WR/WJ are batched 3x3-block matmuls)."""
    if weight is None:
        return None, None
    weight = weight if isinstance(weight, (tuple, list)) else [weight]
    assert len(weight) == len(R_list)
    WR, WJ = [], []
    for w, r, Jr in zip(weight, R_list, J_list):
        d = r.shape[-1]
        P = Jr.shape[-1]
        if d == 1:
            w = w.reshape(w.shape + (1, 1))
        wb = jnp.broadcast_to(w, r.shape[:-1] + (d, d)).reshape(-1, d, d)
        rb = r.reshape(-1, d)
        WR.append(jnp.einsum('nij,nj->ni', wb, rb,
                             precision=_HI).reshape(-1))
        WJ.append(jnp.einsum('nij,njk->nik', wb, Jr.reshape(-1, d, P),
                             precision=_HI).reshape(-1, P))
    return jnp.concatenate(WR), jnp.concatenate(WJ, axis=0)


class _Optimizer:
    """Shared machinery: params handle, jacobian, correctors, jit cache."""

    def __init__(self, model, kernel=None, corrector=None):
        self.module = model
        self.model = RobustModel(model, kernel)
        if kernel is not None:
            kernel = kernel if isinstance(kernel, (tuple, list)) else [kernel]
            kernel = [k if k is not None else Trivial() for k in kernel]
            if corrector is None:
                corrector = [FastTriggs(k) for k in kernel]
        if corrector is None:
            corrector = [Trivial()]
        corrector = corrector if isinstance(corrector, (tuple, list)) \
            else [corrector]
        self.corrector = [c if c is not None else Trivial()
                          for c in corrector]
        self.loss = None
        self.last = None
        self._compiled = {}

    # -- jacobian of all residuals w.r.t. all params, flattened per residual
    def _residuals_and_jac(self, params, input, target):
        leaves, treedef = jax.tree_util.tree_flatten(params)

        def func(leaves_):
            p = jax.tree_util.tree_unflatten(treedef, leaves_)
            return tuple(self.model.forward(p, input, target))

        R = func(leaves)
        J = jax.jacrev(func)(leaves)
        J_flat = []
        for Ji, ri in zip(J, R):
            J_flat.append(jnp.concatenate(
                [jnp.reshape(j, (ri.size, l.size))
                 for j, l in zip(Ji, leaves)], axis=1))
        return list(R), J_flat

    def _corrected(self, R, J):
        for i in range(len(R)):
            c = self.corrector[0] if len(self.corrector) == 1 \
                else self.corrector[i]
            R[i], J[i] = c(R=R[i], J=J[i])
        return R, J

    def _params(self):
        return self.module.parameters()

    def _writeback(self, params):
        self.module.load_parameters(params)

    def _key(self, input, target, weight):
        return jax.tree_util.tree_structure((input, target, weight))


class GaussNewton(_Optimizer):
    r"""Gauss-Newton optimizer for nonlinear least squares:

    .. math:: \min_{\theta} \sum_i \rho_i\big(\|r_i(\theta)\|^2\big)

    Each step solves :math:`J\,\delta = -r` by pseudo-inversion
    (deliberately NOT the normal equations — same conditioning choice as
    the reference) and retracts: LieTensor parameters update by
    ``Exp(delta) * X``, Euclidean ones by addition.  The whole step —
    residuals, ``jacrev``, kernel correction, solve, retraction — is ONE
    jitted XLA program; ``optimize()`` additionally runs the
    StopOnPlateau loop on device (a single host sync per optimization).

    Args:
        model: a :class:`pypose_tpu.Module` whose ``forward`` returns the
            residual array (or a tuple of them); its
            :class:`pypose_tpu.Parameter` leaves are optimized.
        solver: linear solver (default :class:`pypose_tpu.optim.PINV`).
        kernel: robust kernel(s) applied to squared residual norms.
        corrector: residual/Jacobian corrector(s); defaults to
            :class:`FastTriggs` when a kernel is given.
        weight: optional block weight matrix (information matrix).

    Ref: pypose/optim/optimizer.py:143-328.

    Example:
        >>> import jax, pypose_tpu as pp
        >>> class PoseInv(pp.Module):
        ...     def __init__(self):
        ...         super().__init__()
        ...         self.pose = pp.Parameter(pp.identity_se3(2))
        ...     def forward(self, input):
        ...         return (self.pose.Exp() @ input).Log().tensor()
        >>> target = pp.randn_SE3(2, sigma=0.5, key=jax.random.PRNGKey(0))
        >>> opt = pp.optim.GN(PoseInv())
        >>> for _ in range(4):
        ...     loss = opt.step(target)
        >>> loss < 1e-7                       # converged in 4 iterations
        True
    """

    def __init__(self, model, solver=None, kernel=None, corrector=None,
                 weight=None, vectorize=True):
        super().__init__(model, kernel, corrector)
        self.solver = PINV() if solver is None else solver
        self.weight = weight

    def _core(self, params, input, target, weight):
        R, J = self._residuals_and_jac(params, input, target)
        R, J = self._corrected(R, J)
        WR, WJ = _apply_weight(weight, R, J)
        R_flat = jnp.concatenate([r.reshape(-1) for r in R])
        J_flat = jnp.concatenate(J, axis=0)
        A, b = (J_flat, -R_flat) if weight is None else (WJ, -WR)
        D = self.solver(A=A, b=b.reshape(-1, 1))
        last = self.model.loss(params, input, target)
        new_params = _update_parameters(params, D)
        loss = self.model.loss(new_params, input, target)
        return new_params, loss, last

    def step(self, input=None, target=None, weight=None):
        weight = self.weight if weight is None else weight
        params = self._params()
        key = self._key(input, target, weight)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(self._core)
        new_params, loss, last = self._compiled[key](
            params, input, target, weight)
        self._writeback(new_params)
        loss, last = jax.device_get((loss, last))
        self.last = self.loss if self.loss is not None else float(last)
        self.loss = float(loss)
        return self.loss

    def _optimize_run(self, params, input, target, weight, steps,
                      patience, decreasing):
        """Pure device-side StopOnPlateau loop around the GN core —
        traceable, so it can be inlined inside a larger jit (EPnP's
        beta refinement does this)."""
        hist0 = jnp.full((steps,), jnp.nan, dtype=jnp.float32)

        def cond(st):
            return (~st[-1]) & (st[3] < steps)

        def body(st):
            p, last, hist, i, pat, _ = st
            p2, loss, _ = self._core(p, input, target, weight)
            hist = hist.at[i].set(loss.astype(jnp.float32))
            pat2 = jnp.where(last - loss < decreasing, pat + 1,
                             jnp.zeros_like(pat))
            return (p2, loss.astype(jnp.float32), hist, i + 1, pat2,
                    pat2 >= patience)

        init = (params, jnp.asarray(jnp.inf, jnp.float32), hist0,
                jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                jnp.asarray(False))
        p, loss, hist, nsteps, _, _ = jax.lax.while_loop(cond, body, init)
        return p, loss, hist, nsteps

    def optimize(self, input=None, target=None, weight=None, steps=10,
                 patience=5, decreasing=1e-3):
        """Device-side StopOnPlateau loop around the GN core (one host
        sync total); ``StopOnPlateau.optimize`` delegates here when not
        verbose.  Returns the final loss; per-step losses in
        ``self.history``."""
        weight = self.weight if weight is None else weight
        params = self._params()
        key = ('optimize', steps, patience, decreasing,
               self._key(input, target, weight))
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                lambda p, i, t, w: self._optimize_run(
                    p, i, t, w, steps, patience, decreasing))
        p, loss, hist, nsteps = self._compiled[key](
            params, input, target, weight)
        self._writeback(p)
        loss, hist, nsteps = jax.device_get((loss, hist, nsteps))
        self.history = [float(h) for h in hist[:int(nsteps)]]
        self.loss = float(loss)
        self.last = self.history[-2] if len(self.history) > 1 else None
        return self.loss


GN = GaussNewton


class LevenbergMarquardt(_Optimizer):
    r"""Levenberg-Marquardt optimizer: damped normal equations

    .. math:: (J^\top W J + \lambda\,\mathrm{diag}(J^\top W J))\,\delta
              = -J^\top W r

    with a pluggable damping strategy (:class:`Constant`,
    :class:`Adaptive`, :class:`TrustRegion`) and the reference's
    reject-retry semantics (pypose/optim/optimizer.py:662-679): a step
    that increases the loss is rejected up to ``reject`` times with
    increased damping.  On TPU the reject loop is a ``lax.while_loop``
    carried on device — retries never pay a host round-trip — and
    ``optimize()`` wraps the whole StopOnPlateau schedule into one
    program.

    The ``sparse=True`` factor-graph path of the reference maps to
    :class:`pypose_tpu.optim.sparse.SparseLM` (TPU-native block-sparse
    design replacing the external CUDA backend, optimizer.py:629-643).

    Ref: pypose/optim/optimizer.py:330-680.

    Example:
        >>> import jax, pypose_tpu as pp
        >>> from pypose_tpu.optim.strategy import Adaptive
        >>> class PoseInv(pp.Module):
        ...     def __init__(self):
        ...         super().__init__()
        ...         self.pose = pp.Parameter(pp.identity_se3(2))
        ...     def forward(self, input):
        ...         return (self.pose.Exp() @ input).Log().tensor()
        >>> target = pp.randn_SE3(2, sigma=0.5, key=jax.random.PRNGKey(1))
        >>> opt = pp.optim.LM(PoseInv(), strategy=Adaptive(damping=1e-6))
        >>> for _ in range(4):
        ...     loss = opt.step(target)
        >>> loss < 1e-7                       # converged in 4 iterations
        True

        Or run the whole schedule device-side:

        >>> opt2 = pp.optim.LM(PoseInv())
        >>> final = opt2.optimize(target, steps=6)
        >>> final < 1e-7 and len(opt2.history) <= 6
        True
    """

    def __init__(self, model, solver=None, strategy=None, kernel=None,
                 corrector=None, weight=None, reject=16, min=1e-6, max=1e32,
                 vectorize=True, sparse=False):
        if sparse:
            raise ValueError(
                "LM(sparse=True) maps to the TPU-native factor-graph path: "
                "use pypose_tpu.optim.sparse.SparseLM with Factor edge "
                "declarations (see MIGRATING.md) — no runtime index-tracing "
                "backend is needed.")
        assert min > 0, ValueError('min value has to be positive: ' + str(min))
        assert max > 0, ValueError('max value has to be positive: ' + str(max))
        super().__init__(model, kernel, corrector)
        self.solver = Cholesky() if solver is None else solver
        self.strategy = TrustRegion() if strategy is None else strategy
        self.min, self.max = min, max
        self.reject = reject
        self.reject_count = 0
        self.weight = weight
        self.strategy_state = None

    def _core(self, params, strat_state, input, target, weight):
        R, J = self._residuals_and_jac(params, input, target)
        R, J = self._corrected(R, J)
        WR, WJ = _apply_weight(weight, R, J)
        R_flat = jnp.concatenate([r.reshape(-1) for r in R])
        J_flat = jnp.concatenate(J, axis=0)
        if weight is None:
            JT_W_R = jnp.matmul(J_flat.T, R_flat, precision=_HI)
            A = jnp.matmul(J_flat.T, J_flat, precision=_HI)
        else:
            JT_W_R = jnp.matmul(J_flat.T, WR, precision=_HI)
            A = jnp.matmul(J_flat.T, WJ, precision=_HI)
        diagA = jnp.clip(jnp.diagonal(A), self.min, self.max)
        A = A - jnp.diag(jnp.diagonal(A)) + jnp.diag(diagA)
        b = -JT_W_R.reshape(-1, 1)
        R_col = R_flat.reshape(-1, 1)
        last = self.model.loss(params, input, target)

        def cond(state):
            return ~state[-1]

        def body(state):
            p0, loss, strat, count, _ = state
            damping = strat['damping']
            A_d = A + jnp.diag(jnp.diagonal(A) * damping)
            D = self.solver(A=A_d, b=b)
            bad = ~jnp.all(jnp.isfinite(D))
            D_safe = jnp.where(bad, jnp.zeros_like(D), D)
            cand = _update_parameters(p0, D_safe)
            loss_new = self.model.loss(cand, input, target)
            # a non-finite candidate loss is as bad as a non-finite delta
            # (`last < NaN` is False and would force-accept it)
            bad = bad | ~jnp.isfinite(loss_new)
            strat_new = self.strategy.update(
                strat, last, loss_new, J_flat, D_safe, R_col)
            worse = last < loss_new
            rejectable = worse & (count < self.reject) & ~bad
            done = ~rejectable
            take_cand = done & ~bad
            p_out = jax.tree_util.tree_map(
                lambda a, c: jnp.where(take_cand, c, a), p0, cand)
            loss_out = jnp.where(take_cand, loss_new, last)
            count_out = count + rejectable.astype(count.dtype)
            return (p_out, loss_out, strat_new, count_out, done)

        state0 = (params, last, strat_state,
                  jnp.asarray(0, jnp.int32), jnp.asarray(False))
        p_f, loss_f, strat_f, count_f, _ = jax.lax.while_loop(
            cond, body, state0)
        return p_f, loss_f, last, strat_f, count_f

    def step(self, input=None, target=None, weight=None):
        weight = self.weight if weight is None else weight
        params = self._params()
        if self.strategy_state is None:
            dtype = jax.tree_util.tree_leaves(params)[0].dtype
            self.strategy_state = self.strategy.init(dtype)
        key = self._key(input, target, weight)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(self._core)
        new_params, loss, last, strat_state, count = self._compiled[key](
            params, self.strategy_state, input, target, weight)
        self._writeback(new_params)
        self.strategy_state = strat_state
        loss, last, count = jax.device_get((loss, last, count))
        self.reject_count = int(count)
        self.last = float(last)
        self.loss = float(loss)
        return self.loss

    def optimize(self, input=None, target=None, weight=None, steps=10,
                 patience=5, decreasing=1e-3):
        """Device-side StopOnPlateau loop (scheduler.py:64-203 semantics:
        patience on absolute decrease, quit on rejected step) around the
        LM core — ONE host sync for the whole optimization instead of one
        per step.  ``StopOnPlateau.optimize`` delegates here when not
        verbose.  Returns the final loss; per-step losses in
        ``self.history``."""
        weight = self.weight if weight is None else weight
        params = self._params()
        if self.strategy_state is None:
            dtype = jax.tree_util.tree_leaves(params)[0].dtype
            self.strategy_state = self.strategy.init(dtype)

        def run(params, strat, input, target, weight):
            hist0 = jnp.full((steps,), jnp.nan, dtype=jnp.float32)

            def cond(st):
                return (~st[-1]) & (st[4] < steps)

            def body(st):
                p, strat_s, _, hist, i, pat, _ = st
                p2, loss, last, strat2, count = self._core(
                    p, strat_s, input, target, weight)
                hist = hist.at[i].set(loss.astype(jnp.float32))
                pat2 = jnp.where(last - loss < decreasing, pat + 1,
                                 jnp.zeros_like(pat))
                # quit on rejection only when the step also failed to
                # make the required progress (the reference quits on ANY
                # rejection, scheduler.py:153-159 — wrong for recoverable
                # damping escalation; see optim/ba.py optimize)
                stop = (pat2 >= patience) | \
                    ((count > 0) & (last - loss < decreasing))
                return (p2, strat2, loss, hist, i + 1, pat2, stop)

            init = (params, strat, jnp.asarray(jnp.inf, jnp.float32),
                    hist0, jnp.asarray(0, jnp.int32),
                    jnp.asarray(0, jnp.int32), jnp.asarray(False))
            p, strat_f, loss, hist, nsteps, _, _ = jax.lax.while_loop(
                cond, body, init)
            return p, strat_f, loss, hist, nsteps

        key = ('optimize', steps, patience, decreasing,
               self._key(input, target, weight))
        if key not in self._compiled:
            self._compiled[key] = jax.jit(run)
        p, strat, loss, hist, nsteps = self._compiled[key](
            params, self.strategy_state, input, target, weight)
        self._writeback(p)
        self.strategy_state = strat
        loss, hist, nsteps = jax.device_get((loss, hist, nsteps))
        self.history = [float(h) for h in hist[:int(nsteps)]]
        self.loss = float(loss)
        self.last = self.history[-2] if len(self.history) > 1 else None
        return self.loss


LM = LevenbergMarquardt


def make_batch_optimizer(model, steps=10, strategy=None, kernel=None,
                         solver=None, has_target=False, has_weight=False):
    r"""Build a reusable jitted solver for MANY independent instances of the
    same NLS problem: ``jax.vmap`` of the LM core over a leading problem
    axis of ``input`` (and ``target``/``weight`` when enabled).

    This is the TPU-native form of the reference's headline batched
    optimization (its batching lives inside one problem's residual dims;
    here whole optimization problems vectorize — thousands of independent
    pose estimations run as a single XLA program).

    Returns ``solve(input, target=None, weight=None) ->
    (params_batched, losses)``.

    Example:
        >>> import jax, pypose_tpu as pp
        >>> from pypose_tpu.optim import make_batch_optimizer
        >>> from pypose_tpu.optim.strategy import Constant
        >>> class PoseInv(pp.Module):
        ...     def __init__(self):
        ...         super().__init__()
        ...         self.pose = pp.Parameter(pp.identity_se3(1))
        ...     def forward(self, input):
        ...         return (self.pose.Exp() @ input).Log().tensor()
        >>> solve = make_batch_optimizer(PoseInv(), steps=4,
        ...                              strategy=Constant(damping=1e-6))
        >>> targets = pp.randn_SE3(32, 1, sigma=0.3,
        ...                        key=jax.random.PRNGKey(0))
        >>> params, losses = solve(targets)   # 32 problems, one program
        >>> bool(losses.max() < 1e-8)
        True
    """
    opt = LevenbergMarquardt(model, strategy=strategy, kernel=kernel,
                             solver=solver)
    params0 = model.parameters()
    dtype = jax.tree_util.tree_leaves(params0)[0].dtype
    strat0 = opt.strategy.init(dtype)

    def solve_one(inp, tgt, wgt):
        def body(i, st):
            params, strat, _ = st
            params, loss, last, strat, cnt = opt._core(
                params, strat, inp, tgt, wgt)
            return (params, strat, loss)

        params, strat, loss = jax.lax.fori_loop(
            0, steps, body,
            (params0, strat0, jnp.asarray(jnp.inf, dtype)))
        return params, loss

    in_axes = (0, 0 if has_target else None, 0 if has_weight else None)
    vsolve = jax.jit(jax.vmap(solve_one, in_axes=in_axes))

    def solve(input, target=None, weight=None):
        return vsolve(input, target, weight)

    return solve


def batch_optimize(model, input, target=None, weight=None, steps=10,
                   strategy=None, kernel=None, solver=None):
    r"""One-shot convenience around :func:`make_batch_optimizer`."""
    solve = make_batch_optimizer(model, steps=steps, strategy=strategy,
                                 kernel=kernel, solver=solver,
                                 has_target=target is not None,
                                 has_weight=weight is not None)
    return solve(input, target, weight)
