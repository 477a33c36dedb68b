"""TPU-native ops: decoding, targets, geometry, resampling, Pallas kernels."""
