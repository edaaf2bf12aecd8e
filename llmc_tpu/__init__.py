"""llmc_tpu: TPU-native post-training compression and quantized serving.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
ModelTC/llmc (LightCompress): calibration -> blockwise transform ->
(fake|real) quantize -> evaluate -> serve, designed TPU-first.
"""

__version__ = '0.1.0'
