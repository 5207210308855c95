"""modjac cross-checks vs hand-built jacrev over functional_call, mirroring
the reference's cross-implementation equivalence oracle
(tests/optim/test_jacobian.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

import pypose_tpu as pp
from pypose_tpu.nn import functional_call
from pypose_tpu.optim import modjac, modjacrev, modjacfwd


class PoseAct(pp.Module):
    def __init__(self, key):
        super().__init__()
        self.pose = pp.Parameter(pp.randn_SO3(2, key=key))

    def forward(self, pts):
        return self.pose.Act(pts)


def test_modjac_matches_manual():
    model = PoseAct(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 3))

    J = modjac(model, input=pts, flatten=True)
    assert J.shape == (6, 8)

    params = model.parameters()

    def f(p):
        return functional_call(model, p, (pts,))

    Jref = jax.jacrev(f)(params)['pose']
    Jref = np.asarray(Jref.tensor()).reshape(6, 8)
    np.testing.assert_allclose(np.asarray(J), Jref, atol=1e-6)
    # tangent convention: quaternion w-columns are zero
    np.testing.assert_allclose(Jref[:, 3], 0.0)
    np.testing.assert_allclose(Jref[:, 7], 0.0)


def test_modjacrev_modjacfwd_agree():
    model = PoseAct(jax.random.PRNGKey(2))
    pts = jax.random.normal(jax.random.PRNGKey(3), (2, 3))
    Jr = modjacrev(model, (pts,))['pose']
    Jf = modjacfwd(model, (pts,))['pose']
    np.testing.assert_allclose(np.asarray(Jr.tensor()),
                               np.asarray(Jf.tensor()), atol=1e-5)


def test_modjac_multiple_outputs():
    class Two(pp.Module):
        def __init__(self):
            super().__init__()
            self.x = pp.Parameter(jnp.arange(3.0))

        def forward(self, a):
            return self.x * a, (self.x ** 2).sum(keepdims=True)

    model = Two()
    J = modjac(model, input=2.0)
    assert len(J) == 2
    np.testing.assert_allclose(np.asarray(J[0]), 2.0 * np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(J[1]),
                               2.0 * np.arange(3.0)[None], atol=1e-6)
