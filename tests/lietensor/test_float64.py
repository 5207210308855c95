"""float64 support: runs key numerics in a subprocess with x64 enabled
(jax_enable_x64 is process-global, so it cannot be toggled inside the main
test process).
"""

import subprocess
import sys

import pytest

SCRIPT = r"""
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np
import pypose_tpu as pp

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (20, 3), dtype=jnp.float64)
X = pp.so3(x).Exp()
assert X.dtype == jnp.float64
rt = np.abs(np.asarray(X.Log().tensor() - x)).max()
assert rt < 1e-14, f'so3 roundtrip {rt}'

xs = jax.random.normal(key, (20, 6), dtype=jnp.float64) * 0.8
Xs = pp.se3(xs).Exp()
rt = np.abs(np.asarray(Xs.Log().tensor() - xs)).max()
assert rt < 1e-13, f'se3 roundtrip {rt}'

# gradient precision
g = jax.grad(lambda X: jnp.sum(X.Log().tensor() ** 2))(Xs)
from pypose_tpu.lietensor.jacobian import se3_Jl_inv
expect = 2 * jnp.einsum('nij,ni->nj', se3_Jl_inv(Xs.Log().tensor()),
                        Xs.Log().tensor())
err = np.abs(np.asarray(g.tensor()[..., :6] - expect)).max()
assert err < 1e-12, f'grad err {err}'

# optimizer in f64
class PoseInv(pp.Module):
    def __init__(self):
        super().__init__()
        self.pose = pp.Parameter(pp.randn_se3(
            2, sigma=0.4, key=jax.random.PRNGKey(1), dtype=jnp.float64))
    def forward(self, input):
        return (self.pose.Exp() @ input).Log().tensor()

inputs = pp.randn_SE3(2, key=jax.random.PRNGKey(2), dtype=jnp.float64)
opt = pp.optim.LM(PoseInv())
for _ in range(6):
    loss = opt.step(inputs)
assert loss < 1e-22, f'f64 LM loss {loss}'
print('F64-OK')
"""


def test_float64_subprocess():
    out = subprocess.run([sys.executable, '-c', SCRIPT],
                         capture_output=True, text=True, timeout=600,
                         cwd='/root/repo')
    assert 'F64-OK' in out.stdout, out.stdout + out.stderr
