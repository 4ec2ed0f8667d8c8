"""Single-node oracle — plain-Python reference run of the identical kernels."""
