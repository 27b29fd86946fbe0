"""Utilities: native planner bindings, roofline math, profiling helpers."""

from . import native, profiling, roofline  # noqa: F401
