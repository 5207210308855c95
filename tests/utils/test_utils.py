"""Stepper, checkpoint, collect_env, stack/cat/split tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

import pypose_tpu as pp
from pypose_tpu.utils import ReduceToBason, checkpoint, get_pretty_env_info


def test_reduce_to_bason():
    s = ReduceToBason(steps=100, patience=2, decreasing=1e-2, tol=1e-6)
    losses = [1.0, 0.5, 0.499, 0.4985, 0.498]
    stopped_at = None
    for i, l in enumerate(losses):
        if not s.continual():
            stopped_at = i
            break
        s.step(l)
    assert not s.continual()
    # tolerance stop
    s2 = ReduceToBason(steps=100, tol=1e-3)
    s2.step(1e-4)
    assert not s2.continual()
    # max steps stop
    s3 = ReduceToBason(steps=2, patience=99, decreasing=-1)
    s3.step(5.0)
    s3.step(4.0)
    assert not s3.continual()


def test_checkpoint_roundtrip(tmp_path):
    a = pp.randn_SE3(3, key=jax.random.PRNGKey(0))
    tree = {'poses': a, 'step': 7, 'arr': jnp.arange(4.0),
            'nested': [pp.randn_so3(2, key=jax.random.PRNGKey(1)), 'tag'],
            'tup': (1.5, jnp.ones(2))}
    path = os.path.join(str(tmp_path), 'state')
    checkpoint.save(path, tree)
    back = checkpoint.load(path)
    assert back['poses'].ltype is pp.SE3_type
    np.testing.assert_allclose(np.asarray(back['poses'].tensor()),
                               np.asarray(a.tensor()))
    assert back['step'] == 7
    assert back['nested'][0].ltype is pp.so3_type
    assert back['nested'][1] == 'tag'
    assert isinstance(back['tup'], tuple)


def test_collect_env():
    info = get_pretty_env_info()
    assert 'JAX version' in info
    assert 'pypose_tpu version' in info


def test_stack_cat_split():
    a = pp.randn_SO3(3, key=jax.random.PRNGKey(2))
    b = pp.randn_SO3(3, key=jax.random.PRNGKey(3))
    s = pp.stack([a, b])
    assert s.lshape == (2, 3) and s.ltype is pp.SO3_type
    c = pp.cat([a, b])
    assert c.lshape == (6,)
    p1, p2 = pp.split(c, 3)
    np.testing.assert_allclose(np.asarray(p1.tensor()),
                               np.asarray(a.tensor()))
    q1, q2 = pp.split(c, [2, 4])
    assert q1.lshape == (2,) and q2.lshape == (4,)


def test_optimizer_state_checkpoint(tmp_path):
    """Save/resume an LM optimization mid-run."""
    class PoseInv(pp.Module):
        def __init__(self, key):
            super().__init__()
            self.pose = pp.Parameter(pp.randn_se3(2, sigma=0.5, key=key))

        def forward(self, input):
            return (self.pose.Exp() @ input).Log().tensor()

    inputs = pp.randn_SE3(2, key=jax.random.PRNGKey(4))
    m = PoseInv(jax.random.PRNGKey(5))
    opt = pp.optim.LM(m)
    opt.step(inputs)
    path = os.path.join(str(tmp_path), 'opt')
    checkpoint.save(path, {'params': m.parameters(),
                           'strategy': opt.strategy_state})
    state = checkpoint.load(path)
    m2 = PoseInv(jax.random.PRNGKey(6))
    m2.load_parameters({'pose': pp.nn.Parameter(state['params']['pose'])})
    opt2 = pp.optim.LM(m2)
    opt2.strategy_state = state['strategy']
    for _ in range(5):
        loss = opt2.step(inputs)
    assert loss < 1e-8


def test_interop_roundtrip():
    import torch
    t = torch.randn(3, 4)
    a = pp.interop.from_torch(t)
    assert a.shape == (3, 4)
    back = pp.interop.to_torch(a)
    assert torch.allclose(back, t)
    X = pp.randn_SE3(2, key=jax.random.PRNGKey(7))
    assert pp.interop.to_torch(X).shape == (2, 7)
