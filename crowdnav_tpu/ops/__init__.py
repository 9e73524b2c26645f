"""Pure-JAX math kernels: geometry, lidar raycast, perceived-risk pipeline."""
