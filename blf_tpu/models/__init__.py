"""Dynamical systems, contact physics, rigid-body dynamics, LIPM/DCM models."""
