"""Compute ops: lifting, quantization, prediction, rANS.

Each op has a numpy implementation (host oracle / CPU fallback) and a JAX
implementation (device path) with identical integer semantics; tests
cross-check them (tests/test_ops.py).
"""
