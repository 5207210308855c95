from .dynamics import System, LTI, LTV, NLS
from .ekf import EKF
from .ukf import UKF
from .pf import PF
from .imu_preintegrator import IMUPreintegrator
from .lqr import LQR
from .mpc import MPC
from .pnp import EPnP
from .icp import ICP
from .loss import GeodesicLoss, geodesic_loss
from .filtering import rollout as filter_rollout

__all__ = ['System', 'LTI', 'LTV', 'NLS', 'EKF', 'UKF', 'PF',
           'IMUPreintegrator', 'LQR', 'MPC', 'EPnP', 'ICP', 'GeodesicLoss',
           'geodesic_loss', 'filter_rollout']
