"""Device-side math: SE(3) primitives, residual kernels, PCG, LM."""
