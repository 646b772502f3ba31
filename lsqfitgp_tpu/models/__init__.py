"""Turnkey regression models (the reference's ``bayestree``)."""

from .bart import bart
from .bcf import bcf
