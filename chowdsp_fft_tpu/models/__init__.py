"""End-to-end DSP pipelines built from the framework's layers."""

from .sdr import SDRChain, SDRChainConfig  # noqa: F401
