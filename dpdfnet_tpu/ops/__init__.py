"""Numerics and NN primitives for DPDFNet-TPU (pure JAX/XLA, NHWC layouts)."""
