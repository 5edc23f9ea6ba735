"""imvoxelnet_tpu — a TPU-native (JAX / XLA / Pallas / pjit) reimplementation
of the full SamsungLabs/imvoxelnet capability set."""

__version__ = '0.1.0'
