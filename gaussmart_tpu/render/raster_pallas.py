"""Tile-binned Pallas TPU rasterizer (production path).

Placeholder for round-1 early milestones: `rasterize_tiled` is filled in by
the Pallas kernel; until then callers fall back to the dense XLA compositor.
"""
from __future__ import annotations

rasterize_tiled = None


def available() -> bool:
    return rasterize_tiled is not None
