"""Utilities: native planner bindings, roofline math, test helpers."""

from . import native, roofline  # noqa: F401
