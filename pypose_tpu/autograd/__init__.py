from .function import psjac, parallel_for_sparse_jacobian

__all__ = ['psjac', 'parallel_for_sparse_jacobian']
