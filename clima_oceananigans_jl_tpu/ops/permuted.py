"""Metric-protocol view of a grid for PERMUTED-storage arrays.

Shallow-z ocean grids (nz ≈ 24-75) are brutal for the natural (x, y, z)
TPU storage layout: the minor (lane) dimension is padded to 128, so a
zt = 30 field occupies — and streams — 4.3× its useful bytes on every
XLA pass (fills, w-from-continuity, pHY′, AB2 substep...). The
hydrostatic model therefore stores its 3D state TRANSPOSED as (x, z, y)
(y in lanes, z in sublanes padded to 8: ≈ 11% overhead instead of 327%),
which is also exactly the block layout its fused Pallas tendency kernel
prefers (ops/fused_hydrostatic.py "zy"), killing the per-step transposes
around the kernel.

``PermutedGrid`` lets the ordinary whole-array operators
(ops/operators.py, advection fluxes) run unchanged on such arrays: used
together with ``stencil.axis_permutation`` (which redirects the
index-space shifts), it transposes every broadcastable metric /
coordinate array the grid protocol hands out, and delegates everything
else to the wrapped grid. Static metadata (shape, halo, topology) stays
LOGICAL — only data-axis addressing changes.

Reference design note: the reference hardcodes (x, y, z) storage and
relies on CUDA's layout-free scalar indexing
(/root/reference/src/Grids/grid_utils.jl); a layout choice only exists
on TPU, where tiled vector memory makes it a 4× lever.
"""
from __future__ import annotations

import jax.numpy as jnp

#: the hydrostatic shallow-z storage permutation: logical (x, y, z) data
#: lives at physical axes (0, 2, 1) — i.e. arrays are (x, z, y).
XZY = (0, 2, 1)


def permute(arr, perm=XZY):
    """Logical (x, y, z) → permuted physical storage."""
    return jnp.transpose(arr, perm)


def unpermute(arr, perm=XZY):
    """Permuted physical storage → logical (x, y, z)."""
    inv = [0] * len(perm)
    for i, p in enumerate(perm):
        inv[p] = i
    return jnp.transpose(arr, inv)


class PermutedGrid:
    """Wrap ``grid`` so its broadcastable metric/coordinate arrays match
    data stored with logical axis a at physical axis ``perm[a]``."""

    def __init__(self, grid, perm=XZY):
        self.grid = grid
        self.perm = tuple(perm)

    def _t(self, m):
        return (jnp.transpose(m, self.perm)
                if getattr(m, "ndim", 0) == 3 else m)

    # -- metric protocol ---------------------------------------------------
    def spacing(self, axis, loc):
        return self._t(self.grid.spacing(axis, loc))

    def dx(self, loc):
        return self._t(self.grid.dx(loc))

    def dy(self, loc):
        return self._t(self.grid.dy(loc))

    def dz(self, loc):
        return self._t(self.grid.dz(loc))

    def Ax(self, loc):
        return self._t(self.grid.Ax(loc))

    def Ay(self, loc):
        return self._t(self.grid.Ay(loc))

    def Az(self, loc):
        return self._t(self.grid.Az(loc))

    def V(self, loc):
        return self._t(self.grid.V(loc))

    def nodes(self, loc, with_halo=False):
        return tuple(self._t(x) for x in self.grid.nodes(loc, with_halo))

    def interior(self, data):
        sl = [slice(None)] * 3
        for a in range(3):
            sl[self.perm[a]] = slice(self.grid.halo[a],
                                     self.grid.halo[a] + self.grid.shape[a])
        return data[tuple(sl)]

    # -- everything else (shape/halo/topology/dtype/...) is logical --------
    def __getattr__(self, name):
        return getattr(self.grid, name)
