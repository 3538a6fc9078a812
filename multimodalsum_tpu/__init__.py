"""MultimodalSum-TPU: a TPU-native (JAX/Flax/Pallas) opinion-summarization framework."""

__version__ = "0.1.0"
