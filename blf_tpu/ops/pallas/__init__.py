"""Pallas TPU kernels for the framework's hot ops."""
