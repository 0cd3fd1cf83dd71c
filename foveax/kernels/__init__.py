"""Pallas TPU kernels for the hot ops."""

from foveax.kernels.scan2d import build_sat_pallas

__all__ = ["build_sat_pallas"]
