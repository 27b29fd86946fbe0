"""Compute engines and frequency-domain ops."""

from . import convolve, layout, stockham  # noqa: F401
