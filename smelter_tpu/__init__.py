"""smelter_tpu: TPU-native real-time video/audio compositing framework.

A from-scratch re-design of software-mansion/smelter for TPU hardware:
the render core is a fused JAX/XLA/Pallas frame program over HBM-resident
frame tensors; codecs and protocol I/O run on the TPU-VM host (C++/FFmpeg).
"""

__version__ = "0.1.0"
