"""Device-side math: Lie groups, integrators, linear algebra, Pallas kernels."""
