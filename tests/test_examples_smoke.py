"""Smoke-run a subset of examples/ end-to-end on CPU with tiny sizes.

Catches example rot (API drift, import breakage) without the cost of the
full default workloads.  Each example exposes ``--device`` and size knobs.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = [
    ('splines.py', ['--interval', '0.5']),
    ('dynamics.py', ['--steps', '20']),
    ('filters.py', ['--steps', '20', '--particles', '100']),
    ('icp_align.py', ['--points', '100']),
    ('pgo.py', ['--poses', '100', '--steps', '3']),
    ('imu_integration.py', ['--frames', '50']),
    ('rotation_averaging.py', ['--nodes', '40', '--steps', '5']),
    ('bundle_adjustment.py', ['--cams', '6', '--points', '80',
                              '--steps', '4']),
    ('mini_slam.py', ['--frames', '5', '--points', '40']),
    ('mpc_cartpole.py', ['--horizon', '8', '--iters', '2']),
    ('reproj_pgo.py', ['--poses', '8', '--landmarks', '30',
                       '--steps', '3']),
    ('imu_corrector.py', ['--iters', '10', '--frames', '20']),
    ('bicycle.py', ['--steps', '10', '--particles', '100']),
    ('mpc_linear_learning.py', ['--iters', '5']),
    ('pointcloud_registration.py', ['--points', '200']),
]


@pytest.mark.parametrize('script,args', CASES,
                         ids=[c[0] for c in CASES])
def test_example_runs(script, args):
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, 'examples', script),
         '--device', 'cpu'] + args,
        capture_output=True, text=True, timeout=600,
        cwd=ROOT,
    )
    assert proc.returncode == 0, (
        f'{script} failed\nstdout:\n{proc.stdout[-2000:]}\n'
        f'stderr:\n{proc.stderr[-2000:]}')
    assert proc.stdout.strip(), f'{script} printed nothing'
