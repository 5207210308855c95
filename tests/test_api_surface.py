"""Lock the public API surface to the reference's documented API.

Every name listed in the reference's Sphinx sources
(docs/source/{functions,convert,optim,modules,metric,testing,utils,
func,autograd}.rst) must exist at the equivalent location here, so a
reference user can migrate without chasing renames.
"""

import pypose_tpu as pp


TOP_LEVEL = """
is_lietensor is_SE3 hasnan add add_ mul bvv bmv bvmv pm
Exp Log Inv Retr Act Adj AdjT Jinvp Jr
randn_so3 randn_SO3 randn_se3 randn_SE3 randn_sim3 randn_Sim3
randn_rxso3 randn_RxSO3 randn_like
identity_so3 identity_SO3 identity_se3 identity_SE3 identity_sim3
identity_Sim3 identity_rxso3 identity_RxSO3 identity_like
cumprod cumprod_ cummul cummul_ cumops cumops_
reprojerr svdtf chspline bspline
random_filter voxel_filter nbr_filter knn_filter
mat2SO3 mat2SE3 mat2Sim3 mat2RxSO3 from_matrix euler2SO3 vec2skew
tensor translation rotation euler scale matrix quat2unit
cart2homo homo2cart point2pixel pixel2point
SO3 so3 SE3 se3 Sim3 sim3 RxSO3 rxso3 LieTensor Parameter Module
""".split()


def test_top_level_names():
    missing = [n for n in TOP_LEVEL if not hasattr(pp, n)]
    assert not missing, f"missing top-level API: {missing}"


def test_optim_names():
    import pypose_tpu.optim as po
    for n in ['GaussNewton', 'GN', 'LevenbergMarquardt', 'LM']:
        assert hasattr(po, n), n
    subs = {
        'solver': 'PINV LSTSQ Cholesky CG',
        'strategy': 'Constant Adaptive TrustRegion',
        'kernel': 'Scale Huber PseudoHuber SoftLOne Cauchy Arctan Tolerant',
        'corrector': 'FastTriggs Triggs',
        'scheduler': 'StopOnPlateau',
        'functional': 'modjac',
    }
    for sub, names in subs.items():
        mod = getattr(po, sub)
        missing = [n for n in names.split() if not hasattr(mod, n)]
        assert not missing, f"optim.{sub} missing {missing}"


def test_module_names():
    import pypose_tpu.module as pm
    names = ('System LTI LTV NLS EKF UKF PF LQR IMUPreintegrator '
             'EPnP MPC ICP GeodesicLoss').split()
    missing = [n for n in names if not hasattr(pm, n)]
    assert not missing, f"module missing {missing}"


def test_aux_names():
    import pypose_tpu.metric as pme
    import pypose_tpu.testing as pt
    import pypose_tpu.utils as pu
    import pypose_tpu.func as pf
    import pypose_tpu.autograd as pa
    assert hasattr(pme, 'ape') and hasattr(pme, 'rpe')
    assert hasattr(pt, 'assert_close')
    assert hasattr(pu, 'ReduceToBason')
    assert hasattr(pf, 'jacrev')
    assert (hasattr(pa, 'psjac')
            or hasattr(pa.function, 'psjac'))
    assert (hasattr(pa, 'parallel_for_sparse_jacobian')
            or hasattr(pa.function, 'parallel_for_sparse_jacobian'))
