from .geometry import (cart2homo, homo2cart, point2pixel, pixel2point,
                       reprojerr, knn, svdtf, svdstf, nbr_filter,
                       random_filter, voxel_filter, knn_filter)
from .linalg import bvv, bmv, bvmv
from .spline import chspline, bspline
from .checking import is_lietensor, is_SE3, hasnan

__all__ = ['cart2homo', 'homo2cart', 'point2pixel', 'pixel2point',
           'reprojerr', 'knn', 'svdtf', 'svdstf', 'nbr_filter',
           'random_filter', 'voxel_filter', 'knn_filter', 'bvv', 'bmv',
           'bvmv', 'chspline', 'bspline', 'is_lietensor', 'is_SE3', 'hasnan']
