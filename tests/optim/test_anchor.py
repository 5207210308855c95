"""Externally-anchored convergence tests.

data/ref_anchor_sphere*.json is written by tools/ref_anchor.py, which runs
the actual PyTorch reference (LM + Cholesky + TrustRegion(1e4) +
StopOnPlateau; /root/reference/examples/module/pgo/pgo.py:64-85) on the
IDENTICAL problem.  These tests pin pypose_tpu's converged chi2 to the
reference's — not to our own plateau.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from pypose_tpu.datasets import synthetic_sphere
from pypose_tpu.optim.sparse import pgo
from pypose_tpu.optim.strategy import TrustRegion

HERE = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _anchor(n):
    path = os.path.join(HERE, 'data', f'ref_anchor_sphere{n}.json')
    if not os.path.exists(path):
        pytest.skip(f'no vendored reference anchor for sphere{n}')
    with open(path) as f:
        return json.load(f)


def test_sphere500_converges_to_reference_chi2():
    anchor = _anchor(500)
    assert anchor['provenance'].startswith('reference-computed')
    ds = synthetic_sphere(500)
    nodes, history = pgo(ds['nodes'], ds['edges'], ds['poses'],
                         strategy=TrustRegion(radius=1e4), steps=10,
                         cg_iter=150, cg_tol=1e-6)
    # chi2 definitions coincide (identity information matrices): ours must
    # reach the reference's converged value, not merely our own plateau
    assert history[-1] <= anchor['final_chi2'] * 1.02, (
        history, anchor['final_chi2'])
    # and the initial chi2 must agree exactly (same problem, same residual)
    np.testing.assert_allclose(anchor['initial_chi2'],
                               float(_initial_chi2(ds)), rtol=1e-4)


def _initial_chi2(ds):
    from pypose_tpu.lietensor.utils import SE3
    nodes, edges, Z = ds['nodes'], ds['edges'], ds['poses']
    r = (Z.Inv() @ (nodes[edges[:, 0]].Inv() @ nodes[edges[:, 1]])) \
        .Log().tensor()
    return jnp.sum(r * r)
