"""Special functions, pure JAX (no host callbacks — TPU-resident).

Counterpart of reference ``src/lsqfitgp/_special/``; the reference used
scipy ``pure_callback`` for Bessel and inverse-incomplete functions, here
everything is implemented with series/asymptotic branches + Newton
rootfinds so fits compile to single XLA programs.
"""

from ._exp import expm1x
