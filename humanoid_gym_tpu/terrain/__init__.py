"""Terrain synthesis (host-side NumPy, once at init) + JAX heightfield lookup.

Capability analog of reference humanoid/utils/terrain.py (Terrain,
HumanoidTerrain) and the parts of Isaac Gym's terrain_utils it drives
(reference terrain.py:100-143). The synthesis is fresh NumPy; the lookup is a
pure jnp function suitable for use inside jitted physics (contact gap
queries) and observation code (height measurements).
"""

from .primitives import (
    SubGrid,
    discrete_obstacles,
    gap,
    pit,
    pyramid_sloped,
    pyramid_stairs,
    random_uniform,
    stepping_stones,
)
from .terrain import TerrainMap, flat_height_fn, make_height_fn

__all__ = [
    "SubGrid",
    "TerrainMap",
    "discrete_obstacles",
    "flat_height_fn",
    "gap",
    "make_height_fn",
    "pit",
    "pyramid_sloped",
    "pyramid_stairs",
    "random_uniform",
    "stepping_stones",
]
