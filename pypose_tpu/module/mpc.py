r"""Model Predictive Control via iterative LQR.

Ref: pypose/module/mpc.py.  Iterates LQR to convergence without gradients
(stop_gradient), then runs one differentiable LQR pass.
"""

import jax

from ..nn import Module
from ..utils.stepper import ReduceToBason
from .lqr import LQR


class MPC(Module):
    r"""MPC: iLQR under a ReduceToBason stepper + final differentiable pass.

    Ref: mpc.py:7-239 (forward :206).
    """

    def __init__(self, system, Q, p, T, stepper=None):
        super().__init__()
        self.stepper = ReduceToBason(steps=10) if stepper is None else stepper
        self.stepper.max_steps -= 1
        self.lqr = LQR(system, Q, p, T)

    def forward(self, dt, x_init, u_init=None, u_lower=None, u_upper=None,
                du=None):
        x, u = None, u_init
        best = {'x': x, 'u': u, 'cost': None}
        self.stepper.reset()
        while self.stepper.continual():
            x, u, cost = jax.lax.stop_gradient(
                self.lqr(jax.lax.stop_gradient(x_init), dt, u))
            self.stepper.step(cost)
            if best['cost'] is None or bool((cost < best['cost']).all()):
                best = {'x': x, 'u': u, 'cost': cost}
        return self.lqr(x_init, dt, u_traj=best['u'])
