"""Pure-Python deterministic kernels shared by the Spark UDFs and the oracle."""
