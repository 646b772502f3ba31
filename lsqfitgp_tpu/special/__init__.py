"""Special functions, pure JAX (no host callbacks — TPU-resident).

Counterpart of reference ``src/lsqfitgp/_special/``; the reference used
scipy ``pure_callback`` for Bessel and inverse-incomplete functions, here
everything is implemented with series/asymptotic branches + Newton
rootfinds so fits compile to single XLA programs.  Where jax.scipy ships
a function (zeta, sici, gammainc, betainc, ndtri, ...), it is re-exported.
"""

from jax.scipy.special import zeta as hurwitz_zeta  # ζ(s, q)

from ._exp import expm1x
from ._bessel import j0, kv_half, kvmodx2_hi
from ._expint import ci, si, expn_imag_real
from ._invinc import gammaincinv, gammainccinv, betaincinv
from ._zeta import zeta_real, periodic_zeta, periodic_bernoulli
from ._kv import iv, kv, kvmodx2, jv, jvmodx2
from ._taylor import taylor
