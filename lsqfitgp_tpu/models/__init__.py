"""Turnkey regression models (the reference's ``bayestree``)."""

from .bart import bart
