"""Immersed boundaries: masked topography on any grid.

TPU re-design of /root/reference/src/ImmersedBoundaries/
(ImmersedBoundaries.jl:103, grid_fitted_immersed_boundaries.jl:39,137,
mask_immersed_field.jl, conditional_fluxes.jl): solid geometry is a set
of precomputed boolean masks — one per staggered location — and masking
is a ``jnp.where`` applied to fields and tendencies after each update
(very natural on TPU: branch-free, fused by XLA). A velocity face is
solid when either adjacent cell center is solid (the reference's
"peripheral node" rule), which zeroes advective/diffusive transport
through the boundary.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..utils.location import C, CENTER, F, U_LOC, V_LOC, W_LOC


def _face_mask(solid_c, axis):
    """Face solid if either adjacent center solid; with-halo roll."""
    return solid_c | jnp.roll(solid_c, 1, axis=axis)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ImmersedBoundary:
    """Precomputed solid masks per staggered location (True = solid)."""

    solid_ccc: jnp.ndarray
    solid_fcc: jnp.ndarray
    solid_cfc: jnp.ndarray
    solid_ccf: jnp.ndarray

    def tree_flatten(self):
        return (self.solid_ccc, self.solid_fcc, self.solid_cfc, self.solid_ccf), ()

    @classmethod
    def tree_unflatten(cls, static, leaves):
        return cls(*leaves)

    @classmethod
    def from_mask(cls, grid, mask_fn):
        """GridFittedBoundary (reference :137): mask_fn(x,y,z) → True solid."""
        x, y, z = grid.nodes(CENTER, with_halo=True)
        solid = jnp.broadcast_to(mask_fn(x, y, z), grid.total_shape)
        return cls(solid, _face_mask(solid, 0), _face_mask(solid, 1),
                   _face_mask(solid, 2))

    @classmethod
    def from_bottom_height(cls, grid, bottom):
        """GridFittedBottom (reference :39): solid where z < h(x, y)."""
        x, y, z = grid.nodes(CENTER, with_halo=True)
        h = bottom(x, y) if callable(bottom) else jnp.asarray(bottom, grid.dtype)
        solid = jnp.broadcast_to(z < h, grid.total_shape)
        return cls(solid, _face_mask(solid, 0), _face_mask(solid, 1),
                   _face_mask(solid, 2))

    def mask_for(self, loc):
        if loc == U_LOC:
            return self.solid_fcc
        if loc == V_LOC:
            return self.solid_cfc
        if loc == W_LOC:
            return self.solid_ccf
        return self.solid_ccc

    def mask_field(self, data, loc, value=0.0):
        """Zero (or set) a field inside the solid
        (reference mask_immersed_field!)."""
        return jnp.where(self.mask_for(loc), value, data)

    # -- model hooks ---------------------------------------------------------
    def mask_state(self, model, state):
        locs = model._locs()
        sol = {name: self.mask_field(arr, locs[name])
               for name, arr in state["solution"].items()}
        return dict(state, solution=sol)

    def mask_tendency(self, model, name, G):
        return self.mask_field(G, model._locs().get(name, CENTER))


@dataclasses.dataclass(frozen=True)
class GridFittedBoundary:
    """Spec: solid where mask(x, y, z); built by the model on its final
    (halo-inflated) grid via ``.build(grid)``."""

    mask: Any

    def build(self, grid):
        return ImmersedBoundary.from_mask(grid, self.mask)


@dataclasses.dataclass(frozen=True)
class GridFittedBottom:
    """Spec: solid where z < bottom_height(x, y) (or a constant/array)."""

    bottom_height: Any

    def build(self, grid):
        return ImmersedBoundary.from_bottom_height(grid, self.bottom_height)
