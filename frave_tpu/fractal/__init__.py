"""Fractal geometry: tame-twindragon tiling as precomputed index tensors.

The reference builds pointer-chasing structures per image (per-tile
HashMaps, BFS, serpentine scan walks — wavelet_transform.rs:41-705). All of
it is a pure function of (height, width, depth), so this package computes
the whole geometry once on host and exposes it as dense numpy index
tensors; the device pipeline is gather/scatter over those tensors.
"""

from .literals import LITERALS, CENTERS, generate_literals
from .geometry import FractalGeometry, build_geometry, get_geometry
from .schedule import WavefrontSchedule, build_schedule, get_schedule

__all__ = [
    "LITERALS",
    "CENTERS",
    "generate_literals",
    "FractalGeometry",
    "build_geometry",
    "get_geometry",
    "WavefrontSchedule",
    "build_schedule",
    "get_schedule",
]
