"""Axis topologies.

Mirrors the reference's ``Periodic``/``Bounded``/``Flat`` topology types
(/root/reference/src/Grids/Grids.jl:1-14). ``FULLY_CONNECTED`` marks an
axis that is continued on another device shard (the reference uses it for
MPI-partitioned sides, src/Distributed/distributed_grids.jl); halo filling
for such axes happens via collective neighbor exchange instead of local
formulas.
"""
from __future__ import annotations

import enum


class Topology(str, enum.Enum):
    PERIODIC = "periodic"
    BOUNDED = "bounded"
    FLAT = "flat"
    FULLY_CONNECTED = "fully_connected"  # continued on a neighboring shard

    def __repr__(self) -> str:
        return self.value


PERIODIC = Topology.PERIODIC
BOUNDED = Topology.BOUNDED
FLAT = Topology.FLAT
FULLY_CONNECTED = Topology.FULLY_CONNECTED
