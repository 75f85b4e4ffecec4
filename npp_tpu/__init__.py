"""NPP-TPU: a TPU-native framework for learning continuous implicit
representations of near-periodic patterns (completion, segmentation,
remapping, periodicity detection).

Rebuilt from scratch for JAX/XLA/Pallas/pjit; capability reference:
github.com/ArmastusChen/Learning-Continuous-Implicit-Representation-for-Near-Periodic-Patterns
"""
__version__ = "0.1.0"
