"""merfish3d-tpu: TPU-native MERFISH post-processing framework.

Capability-compatible with QI2lab/merfish3d-analysis; built on
JAX/XLA/Pallas with TensorStore-backed OME-NGFF v0.5 datastore I/O.
"""

__version__ = "0.1.0"
