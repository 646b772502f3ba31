"""The kernel zoo.

Counterpart of reference ``src/lsqfitgp/_kernels/``; all kernels are
re-exported at the package top level.
"""

from ._basic import (
    Constant, White, ExpQuad, Linear, GammaExp, NNKernel, Gibbs, Periodic,
    Categorical, Rescaling, Expon, BagOfWords, HoleEffect, Cauchy,
    CausalExpQuad, Decaying, Log, Taylor,
)
from ._matern import Maternp, Matern, Bessel
from ._randomwalk import (
    Wiener, FracBrownian, WienerIntegral, OrnsteinUhlenbeck,
    BrownianBridge, StationaryFracBrownian,
)
from ._celerite import Celerite, Harmonic
from ._wendland import Wendland, Circular
from ._spectral import Cos, Pink, Color, Sinc
from ._bart import BART
from ._arma import MA, AR
from ._zeta import Zeta, ZetaFourier, CrossZetaFourier

__all__ = [
    'Constant', 'White', 'ExpQuad', 'Linear', 'GammaExp', 'NNKernel',
    'Gibbs', 'Periodic', 'Categorical', 'Rescaling', 'Expon', 'BagOfWords',
    'HoleEffect', 'Cauchy', 'CausalExpQuad', 'Decaying', 'Log', 'Taylor',
    'Maternp', 'Matern', 'Bessel',
    'Wiener', 'FracBrownian', 'WienerIntegral', 'OrnsteinUhlenbeck',
    'BrownianBridge', 'StationaryFracBrownian',
    'Celerite', 'Harmonic', 'Wendland', 'Circular',
    'Cos', 'Pink', 'Color', 'Sinc',
    'BART', 'MA', 'AR',
    'Zeta', 'ZetaFourier', 'CrossZetaFourier',
]
