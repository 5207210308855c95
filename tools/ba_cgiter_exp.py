r"""cg_iter ladder at the [ba-large] scale (C=2048 auto-routed Schur-CG).

MEASURED r5: cg_iter=300 produces an IDENTICAL chi2 trajectory to 100
(3.580e8 -> 2.556e7 over 10 steps, every intermediate equal) — CG hits
cg_tol=1e-6 before 100 iterations at the dampings the TrustRegion
schedule picks, so the damping schedule (escalated from the default
radius by the r5 quality guard, then relaxed ~2x per good step) is the
convergence limiter, not CG accuracy.  Keep cg_iter=100.

Run:  timeout 1500 python tools/ba_cgiter_exp.py     (takes the TPU tunnel)
"""
import sys, time
sys.path.insert(0, '/root/repo')
import jax
from pypose_tpu.datasets import synthetic_bal
from pypose_tpu.optim.ba import BundleAdjustment
print('devices:', jax.devices(), file=sys.stderr)
ds = synthetic_bal(n_cams=2048, n_points=49152, obs_per_point=6,
                   seed=0, pose_noise=(0.2, 0.05), point_noise=0.3)
for cgi in (100, 300):
    ba = BundleAdjustment(ds['poses'], ds['points'], ds['cam_idx'],
                          ds['pt_idx'], ds['pixels'], ds['cameras'],
                          fix_first_pose=True, cg_iter=cgi, cg_tol=1e-6)
    t0 = time.perf_counter()
    loss = ba.optimize(steps=10, patience=5, decreasing=1e-3)
    dt = time.perf_counter() - t0
    n = max(len(ba.history), 1)
    print(f'cg_iter={cgi}: {n} steps in {dt:.1f}s ({dt/n*1e3:.0f} ms/step '
          f'incl compile); chi2 ' + ' -> '.join(f'{h:.3e}' for h in ba.history),
          file=sys.stderr)
