"""Entropy coding: deterministic context tables and rANS streams."""

from .tables import (
    ALPHABET_SIZE,
    CONTEXT_AMOUNT,
    MAX_FREQ_BITS_CAP,
    NUM_SCALES,
    GRID_WIDTHS,
    assign_bucket,
    select_scale,
    width_of_bucket,
    finalize_context,
    context_from_histogram,
    context_from_wire,
)

__all__ = [
    "ALPHABET_SIZE",
    "CONTEXT_AMOUNT",
    "MAX_FREQ_BITS_CAP",
    "NUM_SCALES",
    "GRID_WIDTHS",
    "assign_bucket",
    "select_scale",
    "width_of_bucket",
    "finalize_context",
    "context_from_histogram",
    "context_from_wire",
]
