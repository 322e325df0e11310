"""Pallas TPU kernels for the lattice hot ops."""

from .spmv import lap_matvec_pallas  # noqa: F401
