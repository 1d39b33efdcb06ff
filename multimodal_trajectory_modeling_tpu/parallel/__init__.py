"""Device-mesh parallelism: data-parallel EM and restart-parallel training."""
