"""Entropy coding: deterministic context tables and rANS streams."""

from .tables import (
    ALPHABET_SIZE,
    CONTEXT_AMOUNT,
    MAX_FREQ_BITS_CAP,
    assign_bucket,
    width_of_bucket,
    finalize_context,
    context_from_histogram,
    context_from_wire,
)

__all__ = [
    "ALPHABET_SIZE",
    "CONTEXT_AMOUNT",
    "MAX_FREQ_BITS_CAP",
    "assign_bucket",
    "width_of_bucket",
    "finalize_context",
    "context_from_histogram",
    "context_from_wire",
]
