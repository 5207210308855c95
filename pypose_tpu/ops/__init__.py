from . import pallas_se3
from .smallinv import inv3x3, solve3x3

__all__ = ['pallas_se3', 'inv3x3', 'solve3x3']
