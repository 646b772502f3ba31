"""Gaussian-copula PPL: express non-Gaussian hyperpriors as
transformations of iid standard Normals.

Counterpart of reference ``src/lsqfitgp/copula/``.
"""

from ._distr import DistrBase, Distr, distribution
from ._copula import Copula, makedict
from ._copulas import (
    beta, dirichlet, gamma, loggamma, invgamma,
    halfcauchy, halfnorm, uniform, lognorm,
)
