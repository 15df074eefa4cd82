"""TPU kernels: XLA and Pallas stencil implementations + the run protocol."""
