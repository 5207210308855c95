from .optimizer import GaussNewton, GN, LevenbergMarquardt, LM, \
    RobustModel, batch_optimize, make_batch_optimizer
from .functional import modjac, modjacrev, modjacfwd
from . import solver
from . import kernel
from . import corrector
from . import strategy
from . import scheduler
from . import sparse
from . import ba
from . import implicit
from .implicit import least_squares

__all__ = ['GaussNewton', 'GN', 'LevenbergMarquardt', 'LM', 'RobustModel', 'batch_optimize', 'make_batch_optimizer',
           'modjac', 'modjacrev', 'modjacfwd', 'solver', 'kernel',
           'corrector', 'strategy', 'scheduler', 'sparse', 'ba', 'implicit', 'least_squares']
