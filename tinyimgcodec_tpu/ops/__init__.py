"""Device (JAX/XLA/Pallas) compute ops for the codec pipeline."""
