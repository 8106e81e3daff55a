"""Compute ops: the TPU-native threecrate-algorithms."""
