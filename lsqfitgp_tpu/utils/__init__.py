"""Utilities: formatting, tabulation, timing."""

from ._format import (
    uformat, fmtspec_kwargs, format_uarray, tabulate_together,
)
from ._bench import benchmark, predtime
