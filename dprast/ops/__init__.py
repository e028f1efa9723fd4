"""Compute kernels: geometry helpers, pure-jnp oracle, MXU matmul-splat path,
and Pallas TPU kernels."""
