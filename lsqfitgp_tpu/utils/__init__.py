"""Utilities: formatting, tabulation, timing."""

from ._format import uformat, format_uarray, tabulate_together
from ._bench import benchmark, predtime
