"""Model layer: the jitted hard-EM engine and the public model classes."""
