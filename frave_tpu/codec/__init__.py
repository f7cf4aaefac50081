"""Codec drivers: encoder/decoder pipeline state machines and container.

Mirrors the reference layer L4 (encoder.rs / decoder.rs state machines)
with host-side orchestration around a jit-compiled stage graph.
"""
