"""Run the runnable examples embedded in public-API docstrings.

The reference ships exhaustive docstrings whose examples double as tests
(pypose/lietensor/utils.py:226-2660 and sphinx doctest CI); this is the
analog: every ``Example:`` block in the modules below is executed as a
doctest on the CPU backend (conftest forces the platform).
"""

import doctest

import pytest

import pypose_tpu
import pypose_tpu.lietensor.utils
import pypose_tpu.lietensor.convert
import pypose_tpu.lietensor.basics
import pypose_tpu.lietensor.lietensor
import pypose_tpu.basics.ops
import pypose_tpu.function.geometry
import pypose_tpu.function.linalg
import pypose_tpu.function.spline
import pypose_tpu.optim.optimizer
import pypose_tpu.optim.kernel
import pypose_tpu.optim.strategy
import pypose_tpu.optim.scheduler
import pypose_tpu.optim.sparse
import pypose_tpu.optim.ba
import pypose_tpu.metric.ape_rpe
import pypose_tpu.module.dynamics
import pypose_tpu.module.ekf
import pypose_tpu.module.ukf
import pypose_tpu.module.pf
import pypose_tpu.module.lqr
import pypose_tpu.module.mpc
import pypose_tpu.module.icp
import pypose_tpu.module.pnp
import pypose_tpu.module.loss
import pypose_tpu.module.imu_preintegrator
import pypose_tpu.datasets

MODULES = [
    pypose_tpu.lietensor.utils,
    pypose_tpu.lietensor.convert,
    pypose_tpu.lietensor.basics,
    pypose_tpu.lietensor.lietensor,
    pypose_tpu.basics.ops,
    pypose_tpu.function.geometry,
    pypose_tpu.function.linalg,
    pypose_tpu.function.spline,
    pypose_tpu.optim.optimizer,
    pypose_tpu.optim.kernel,
    pypose_tpu.optim.strategy,
    pypose_tpu.optim.scheduler,
    pypose_tpu.optim.sparse,
    pypose_tpu.optim.ba,
    pypose_tpu.metric.ape_rpe,
    pypose_tpu.module.dynamics,
    pypose_tpu.module.ekf,
    pypose_tpu.module.ukf,
    pypose_tpu.module.pf,
    pypose_tpu.module.lqr,
    pypose_tpu.module.mpc,
    pypose_tpu.module.icp,
    pypose_tpu.module.pnp,
    pypose_tpu.module.loss,
    pypose_tpu.module.imu_preintegrator,
    pypose_tpu.datasets,
]


@pytest.mark.parametrize('mod', MODULES, ids=lambda m: m.__name__)
def test_module_doctests(mod):
    results = doctest.testmod(
        mod, verbose=False,
        optionflags=doctest.NORMALIZE_WHITESPACE | doctest.ELLIPSIS)
    assert results.attempted > 0, f'no doctests found in {mod.__name__}'
    assert results.failed == 0
