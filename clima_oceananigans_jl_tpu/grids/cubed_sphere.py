"""Cubed-sphere grids: 6 conformal (or gnomonic) faces batched on a
leading axis.

TPU re-design of /root/reference/src/CubedSpheres/ +
Grids/conformal_cubed_sphere_face_grid.jl: instead of 6 separate face
structs with per-face kernel launches and hand-coded rotated halo copies
(cubed_sphere_halo_filling.jl:1-206), faces live on a leading batch axis
(6, Nx, Ny, Nz) — per-face stencils are one ``vmap`` over stacked
face-grid metrics, and inter-face halo filling is a single gather through
precomputed index maps.

Geometry: the default is the exact **conformal** (Rančić et al. 1996) map
(grids/conformal_map.py — derived from first principles, unique ⇒ equal
to the reference's CubedSphere.jl map); ``map_kind="gnomonic"`` selects
the equiangular gnomonic projection. Both share the cube topology and the
property that edge nodes of adjacent faces coincide exactly, so the halo
exchange is EXACT where nodes match: per-location (centers / x-faces /
y-faces) index maps are built by nearest-node matching with snapping —
matched halo nodes copy the neighbour's value directly (with the ±u↔v
component swap at rotated junctions, the analog of the reference's
rotated halo copies), and only the corner wedges (whose halo nodes fall
between neighbour lattices — the reference leaves these to corner-pass
heuristics) use rotated bilinear interpolation. Metrics (edge lengths,
spherical cell areas via the triangle-excess formula) are computed from
the exact node positions.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.location import C, F
from .conformal_map import conformal_coefficients, _basis_integrals
from .rectilinear import RectilinearGrid, _Axis, _build_axis, _bx
from .topology import BOUNDED, FLAT, FULLY_CONNECTED, PERIODIC

# face frames: (center, e1 (ξ/x direction), e2 (η/y direction)).
# Chosen (by search over chart rotations) so that every cube edge is the
# NEGATIVE (x=-1 or y=-1) side of exactly one face: each physical edge
# column of the staggered mesh is then computed by exactly one face and
# every halo gather has a computed source. All frames are right-handed
# (e1 × e2 = outward normal), so chart transitions are holomorphic.
_FACES = [
    ((+1, 0, 0), (0, +1, 0), (0, 0, +1)),
    ((0, +1, 0), (-1, 0, 0), (0, 0, +1)),
    ((-1, 0, 0), (0, 0, -1), (0, -1, 0)),
    ((0, -1, 0), (0, 0, -1), (+1, 0, 0)),
    ((0, 0, +1), (-1, 0, 0), (0, -1, 0)),   # north cap
    ((0, 0, -1), (0, +1, 0), (+1, 0, 0)),   # south cap
]

# square corners / side endpoints in chart coordinates (complex x+iy);
# sides: 0: x=+1, 1: x=-1, 2: y=+1, 3: y=-1
_SIDE_ENDS = {0: (1 - 1j, 1 + 1j), 1: (-1 + 1j, -1 - 1j),
              2: (1 + 1j, -1 + 1j), 3: (-1 - 1j, 1 - 1j)}


def _corner_dir(face, zc):
    """Exact 3D direction of a chart corner (map-independent)."""
    c, e1, e2 = _frame(face)
    p = c + zc.real * e1 + zc.imag * e2
    return p / np.linalg.norm(p)


@dataclasses.dataclass(frozen=True)
class _Motion:
    """Holomorphic rigid chart transition z' = a z + b onto face g."""
    g: int
    a: complex
    b: complex

    def __call__(self, z):
        return self.a * z + self.b


def _side_motions():
    """motions[f][s]: the transition from face f's chart across side s
    into the neighbouring face's chart — derived from exact corner
    correspondences (no hand-maintained orientation tables). Conformal
    charts of the cubed sphere are related by exactly these Euclidean
    motions (Schwarz reflection ⇒ the transition preserves the square
    lattice), which is what makes the halo exchange exact."""
    corners = {(f, zc): _corner_dir(f, zc) for f in range(6)
               for zc in (1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j)}
    motions = [[None] * 4 for _ in range(6)]
    for f in range(6):
        for s, (zA, zB) in _SIDE_ENDS.items():
            A3, B3 = corners[(f, zA)], corners[(f, zB)]
            for g in range(6):
                if g == f:
                    continue
                zmatch = {}
                for zc in (1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j):
                    if np.allclose(corners[(g, zc)], A3, atol=1e-12):
                        zmatch["A"] = zc
                    if np.allclose(corners[(g, zc)], B3, atol=1e-12):
                        zmatch["B"] = zc
                if len(zmatch) == 2:
                    a = (zmatch["B"] - zmatch["A"]) / (zB - zA)
                    b = zmatch["A"] - a * zA
                    # probe: a first-halo point must land inside g's square
                    mid = 0.5 * (zA + zB)
                    outward = (zB - zA) * (-1j)  # right of A→B
                    probe = a * (mid + 0.05 * outward) + b
                    if max(abs(probe.real), abs(probe.imag)) > 1.0:
                        # wrong orientation: swap endpoint correspondence
                        a = (zmatch["A"] - zmatch["B"]) / (zB - zA)
                        b = zmatch["B"] - a * zA
                    motions[f][s] = _Motion(g, complex(a), complex(b))
                    break
    return motions


def _frame(face):
    return tuple(np.asarray(v, np.float64) for v in _FACES[face])


def _conformal_w(z):
    """w(z) and w'(z) of the conformal square→stereographic map
    (vectorized, complex)."""
    d = np.asarray(conformal_coefficients())
    z = np.asarray(z, complex)
    J = _basis_integrals(z.ravel(), d.size)
    w = (J @ d).reshape(z.shape)
    z4 = z ** 4 / 4.0
    psi = np.zeros_like(z)
    for k in range(d.size - 1, -1, -1):
        psi = psi * z4 + d[k]
    dw = (1.0 + z4) ** (1.0 / 3.0) * psi
    return w, dw


def _points(face, xs, ys, map_kind="conformal"):
    """3D unit vectors for square coords (xs, ys) ∈ ~[-1,1] on a face
    (xs, ys broadcastable 2D arrays)."""
    c, e1, e2 = _frame(face)
    if map_kind == "gnomonic":
        t1 = np.tan(np.asarray(xs) * np.pi / 4)
        t2 = np.tan(np.asarray(ys) * np.pi / 4)
        p = (c[None, None, :] + t1[:, :, None] * e1[None, None, :]
             + t2[:, :, None] * e2[None, None, :])
        return p / np.linalg.norm(p, axis=-1, keepdims=True)
    w, _ = _conformal_w(np.asarray(xs) + 1j * np.asarray(ys))
    u, v = np.real(w), np.imag(w)
    r2 = u * u + v * v
    den = 1.0 + r2
    Xm, Ym, Zm = 2 * u / den, 2 * v / den, (1 - r2) / den
    return (Xm[:, :, None] * e1 + Ym[:, :, None] * e2 + Zm[:, :, None] * c)


def _xy_of(face, pts, map_kind="conformal"):
    """Inverse of _points: square coords (x, y) of unit 3D points on a
    face (Newton on the conformal map; closed form for gnomonic)."""
    c, e1, e2 = _frame(face)
    a = pts @ e1
    b = pts @ e2
    cc = pts @ c
    x_g = np.arctan2(a, cc) / (np.pi / 4)
    y_g = np.arctan2(b, cc) / (np.pi / 4)
    if map_kind == "gnomonic":
        return x_g, y_g
    wt = (a + 1j * b) / (1.0 + cc)          # target stereographic position
    z = x_g + 1j * y_g                       # gnomonic initial guess
    for _ in range(12):
        w, dw = _conformal_w(z)
        step = (w - wt) / dw
        z = z - step
        if np.abs(step).max() < 1e-12:
            break
    return np.real(z), np.imag(z)


def _arc(a, b):
    """Great-circle distance between unit-vector arrays."""
    d = np.clip((a * b).sum(-1), -1.0, 1.0)
    return np.arccos(d)


def _tri_area(a, b, c):
    """Spherical triangle area (L'Huilier)."""
    A, B, Cc = _arc(b, c), _arc(a, c), _arc(a, b)
    s = 0.5 * (A + B + Cc)
    t = np.sqrt(np.clip(np.tan(s / 2) * np.tan((s - A) / 2)
                        * np.tan((s - B) / 2) * np.tan((s - Cc) / 2), 0, None))
    return 4.0 * np.arctan(t)


@dataclasses.dataclass
class _LocMap:
    """Exchange gather for one staggered location: for every halo node,
    two candidate sources (the neighbour's x-component lattice and
    y-component lattice) with bilinear weights and rotation coefficients.
    Exact node matches have one-hot weights and ±1/0 rotations."""

    hij: tuple          # (i_idx, j_idx) halo positions in storage coords
    f: jnp.ndarray      # owner face (6, nh)
    iA: jnp.ndarray     # base indices into source lattice A (x-comp)
    jA: jnp.ndarray
    wxA: jnp.ndarray
    wyA: jnp.ndarray
    rA: jnp.ndarray     # coefficient multiplying the A-sample
    iB: jnp.ndarray     # source lattice B (y-comp)
    jB: jnp.ndarray
    wxB: jnp.ndarray
    wyB: jnp.ndarray
    rB: jnp.ndarray


class CubedSphereGrid:
    """6 faces × (Nx, Ny) horizontal cells × Nz vertical levels.

    Field arrays have shape (6, Nx+2H, Ny+2H, Nz+2Hz). ``face_grids()``
    exposes the standard metric protocol per face, so every operator
    works unchanged inside a ``vmap`` over faces; ``fill_halos`` performs
    the inter-face exchange.
    """

    curvilinear = True

    def __init__(self, *, size, z=None, radius=6_371_000.0, halo=2,
                 dtype=jnp.float32, map_kind="conformal"):
        if isinstance(size, int):
            size = (size, size, 1)
        N, _, nz = size[0], size[1], size[2]
        if size[1] != N:
            raise ValueError("cubed-sphere faces must be square")
        if map_kind not in ("conformal", "gnomonic"):
            raise ValueError(f"unknown map_kind {map_kind!r}")
        self.N = N
        self.H = H = int(halo)
        self.radius = float(radius)
        self.dtype = dtype
        self.map_kind = map_kind
        z_topo = FLAT if (nz == 1 and z is None) else BOUNDED
        hz = 0 if z_topo is FLAT else max(1, halo)
        if z is None:
            z = (0.0, 1.0)
        interval = (float(z[0]), float(z[1])) if (np.ndim(z) == 1 and len(z) == 2) else None
        spec = None if interval is not None else z
        self._zaxis = _build_axis(nz, hz, z_topo, interval, spec, dtype=dtype)
        self.Nz, self.Hz = nz, hz

        d = 2.0 / N
        self._d = d
        idx = np.arange(-H, N + H + 1)
        sq_f = -1.0 + idx * d                  # faces, len n+1
        sq_c = 0.5 * (sq_f[:-1] + sq_f[1:])    # centers, len n
        self._sq_f, self._sq_c = sq_f, sq_c

        XF, YF = np.meshgrid(sq_f, sq_f, indexing="ij")
        XC, YC = np.meshgrid(sq_c, sq_c, indexing="ij")
        mk = map_kind
        corners = np.stack([_points(f, XF, YF, mk) for f in range(6)])
        centers = np.stack([_points(f, XC, YC, mk) for f in range(6)])

        R = self.radius
        n = sq_c.size
        # x-edges (between corners (i,j)→(i+1,j)): (6, n, n+1) → (C, F)
        edge_x = R * _arc(corners[:, :-1, :, :], corners[:, 1:, :, :])
        # y-edges: (6, n+1, n) → (F, C)
        edge_y = R * _arc(corners[:, :, :-1, :], corners[:, :, 1:, :])
        dx_cf = edge_x[:, :, :n]
        dy_fc = edge_y[:, :n, :]
        # center-to-center distances: (F,C) along x, (C,F) along y
        dx_fc = np.empty((6, n, n))
        dx_fc[:, 1:, :] = R * _arc(centers[:, :-1, :, :], centers[:, 1:, :, :])
        dx_fc[:, 0, :] = dx_fc[:, 1, :]
        dy_cf = np.empty((6, n, n))
        dy_cf[:, :, 1:] = R * _arc(centers[:, :, :-1, :], centers[:, :, 1:, :])
        dy_cf[:, :, 0] = dy_cf[:, :, 1]
        # cell-center widths: average the two bounding edges
        dx_cc = 0.5 * (edge_x[:, :, :-1] + edge_x[:, :, 1:])
        dy_cc = 0.5 * (edge_y[:, :-1, :] + edge_y[:, 1:, :])
        # (F,F) spacings: averages of neighbouring edge lengths
        dx_ff = np.empty((6, n, n))
        dx_ff[:, 1:, :] = 0.5 * (dx_cc[:, :-1, :] + dx_cc[:, 1:, :])
        dx_ff[:, 0, :] = dx_ff[:, 1, :]
        dy_ff = np.empty((6, n, n))
        dy_ff[:, :, 1:] = 0.5 * (dy_cc[:, :, :-1] + dy_cc[:, :, 1:])
        dy_ff[:, :, 0] = dy_ff[:, :, 1]
        # cell areas at (C,C): two spherical triangles per quad
        a_ = corners[:, :-1, :-1]
        b_ = corners[:, 1:, :-1]
        c_ = corners[:, 1:, 1:]
        d_ = corners[:, :-1, 1:]
        az_cc = R * R * (_tri_area(a_, b_, c_) + _tri_area(a_, c_, d_))
        # vorticity-cell areas at (F,F): quad of surrounding centers
        az_ff = np.empty((6, n, n))
        a2 = centers[:, :-1, :-1]
        b2 = centers[:, 1:, :-1]
        c2 = centers[:, 1:, 1:]
        d2 = centers[:, :-1, 1:]
        az_ff[:, 1:, 1:] = R * R * (_tri_area(a2, b2, c2) + _tri_area(a2, c2, d2))
        az_ff[:, 0, :] = az_ff[:, 1, :]
        az_ff[:, :, 0] = az_ff[:, :, 1]

        to = lambda a: jnp.asarray(a[..., None], dtype)  # add z-broadcast dim
        self._dx = {(C, C): to(dx_cc), (C, F): to(dx_cf),
                    (F, C): to(dx_fc), (F, F): to(dx_ff)}
        self._dy = {(C, C): to(dy_cc), (F, C): to(dy_fc),
                    (C, F): to(dy_cf), (F, F): to(dy_ff)}
        self._az = {(C, C): to(az_cc), (F, F): to(az_ff),
                    (F, C): to(0.5 * (az_cc + np.roll(az_cc, 1, axis=1))),
                    (C, F): to(0.5 * (az_cc + np.roll(az_cc, 1, axis=2)))}
        self._centers3d = centers
        self._motions_tbl = _side_motions()
        self._maps = {}
        self._maps[(C, C)] = self._build_loc_map((C, C))
        self._maps[(F, C)] = self._build_loc_map((F, C))
        self._maps[(C, F)] = self._build_loc_map((C, F))
        self._lonlat(centers)

    # -- grid files --------------------------------------------------------------
    _KEYS = ((C, C), (C, F), (F, C), (F, F))

    def to_file(self, path):
        """Persist the grid's metrics + geometry to one .npz — the analog
        of the reference's grid files (ConformalCubedSphereGrid is loaded
        from a precomputed file, conformal_cubed_sphere_face_grid.jl /
        cubed_sphere_32_grid artifact)."""
        kn = lambda k: "".join("c" if l is C else "f" for l in k)
        data = {"N": self.N, "H": self.H, "radius": self.radius,
                "map_kind": self.map_kind,
                "z_meta": np.array([self._zaxis.n, self._zaxis.h,
                                    int(self._zaxis.topo is not FLAT),
                                    int(self._zaxis.regular),
                                    self._zaxis.extent], np.float64),
                "z_cf": np.asarray(self._zaxis.cf),
                "z_cc": np.asarray(self._zaxis.cc),
                "z_dc": np.asarray(self._zaxis.dc),
                "z_df": np.asarray(self._zaxis.df),
                "centers3d": self._centers3d}
        for name, d in (("dx", self._dx), ("dy", self._dy), ("az", self._az)):
            for k, v in d.items():
                data[f"{name}_{kn(k)}"] = np.asarray(v)
        np.savez(path, **data)

    @classmethod
    def from_file(cls, path, dtype=jnp.float64):
        """Rebuild a grid saved with ``to_file`` without re-evaluating the
        conformal map (exchange maps and motions are cheap and rebuilt)."""
        z = np.load(path, allow_pickle=True)
        obj = object.__new__(cls)
        obj.N, obj.H = int(z["N"]), int(z["H"])
        obj.radius = float(z["radius"])
        obj.map_kind = str(z["map_kind"])
        obj.dtype = dtype
        n, h, bounded, regular, extent = z["z_meta"]
        obj._zaxis = _Axis(int(n), int(h), BOUNDED if bounded else FLAT,
                           jnp.asarray(z["z_cf"], dtype),
                           jnp.asarray(z["z_cc"], dtype),
                           jnp.asarray(z["z_dc"], dtype),
                           jnp.asarray(z["z_df"], dtype),
                           bool(regular), float(extent))
        obj.Nz, obj.Hz = obj._zaxis.n, obj._zaxis.h
        obj._d = 2.0 / obj.N
        idx = np.arange(-obj.H, obj.N + obj.H + 1)
        obj._sq_f = -1.0 + idx * obj._d
        obj._sq_c = 0.5 * (obj._sq_f[:-1] + obj._sq_f[1:])
        kn = lambda k: "".join("c" if l is C else "f" for l in k)
        obj._dx = {k: jnp.asarray(z[f"dx_{kn(k)}"], dtype) for k in cls._KEYS}
        obj._dy = {k: jnp.asarray(z[f"dy_{kn(k)}"], dtype) for k in cls._KEYS}
        obj._az = {k: jnp.asarray(z[f"az_{kn(k)}"], dtype) for k in cls._KEYS}
        obj._centers3d = z["centers3d"]
        obj._motions_tbl = _side_motions()
        obj._maps = {}
        for k in ((C, C), (F, C), (C, F)):
            obj._maps[k] = obj._build_loc_map(k)
        obj._lonlat(obj._centers3d)
        return obj

    # -- node lattices ----------------------------------------------------------
    def _lattice_1d(self, l):
        # storage length is n for every location: face-located dims use
        # sq_f[:-1] (face i sits between cells i-1 and i)
        return self._sq_f[:-1] if l is F else self._sq_c

    def _hop(self, z):
        """Map chart coordinates z (complex array, all in face f's chart,
        vectorized over faces as leading axis 6) through the side motions
        into the owning face's chart. Returns (face, z_owner, a_rot):
        band halos land exactly on the owner's lattice; corner wedges
        (two hops, 120° corner deficit) land slightly off-lattice."""
        motions = self._motions_tbl
        face = np.repeat(np.arange(6)[:, None], z.shape[1], 1)
        z = z.copy()
        a = np.ones_like(z)
        tol = 1e-9
        # positive sides hop AT the edge too (x=+1 / y=+1 columns are halo
        # storage — the matching negative-side face computes them); negative
        # edges are the face's own computed columns and stay
        for _ in range(2):
            for ff in range(6):
                for sd, cond in ((0, z.real > 1 - tol), (1, z.real < -1 - tol),
                                 (2, z.imag > 1 - tol), (3, z.imag < -1 - tol)):
                    m = motions[ff][sd]
                    sel = (face == ff) & cond
                    if not sel.any():
                        continue
                    z[sel] = m.a * z[sel] + m.b
                    a[sel] = a[sel] * m.a
                    face[sel] = m.g
        return face, z, a

    def _node_positions(self, face, loc2):
        """3D node positions incl. halos: interior nodes from the face's
        own map; halo nodes from the OWNER's chart (the fitted conformal
        series is only accurate inside the square — evaluating the owner
        avoids the ill-posed continuation)."""
        xs = self._lattice_1d(loc2[0])
        ys = self._lattice_1d(loc2[1])
        X, Y = np.meshgrid(xs, ys, indexing="ij")
        Z = (X + 1j * Y)[None].repeat(6, 0).reshape(6, -1)
        fo, zo, _ = self._hop(Z)
        pts = np.empty((6, Z.shape[1], 3))
        for g in range(6):
            sel = fo == g
            if not sel.any():
                continue
            zz = zo[sel]
            pg = _points(g, zz.real[None], zz.imag[None], self.map_kind)[0]
            pts[sel] = pg
        return pts[face].reshape(X.shape + (3,)) if np.isscalar(face) \
            else pts.reshape((6,) + X.shape + (3,))

    def _nodes(self, face, loc2):
        return self._node_positions(face, loc2)

    def _tangent(self, face, xs, ys, axis):
        """Unit tangent along the face's x (axis=0) or y (axis=1)
        direction at square coords (xs, ys) — any matching shapes
        (interior coords only)."""
        eps = 1e-6
        dx = (eps, 0.0) if axis == 0 else (0.0, eps)
        xs = np.asarray(xs, float)
        ys = np.asarray(ys, float)
        shape = xs.shape
        p1 = _points(face, (xs + dx[0]).reshape(1, -1),
                     (ys + dx[1]).reshape(1, -1), self.map_kind)[0]
        p0 = _points(face, (xs - dx[0]).reshape(1, -1),
                     (ys - dx[1]).reshape(1, -1), self.map_kind)[0]
        t = (p1 - p0).reshape(shape + (3,))
        return t / np.linalg.norm(t, axis=-1, keepdims=True)

    # -- exchange maps ----------------------------------------------------------
    def _build_loc_map(self, loc2):
        """Per-location exchange map (see _LocMap) built from the chart
        transition motions: band halo nodes land exactly on the owner's
        lattice (one-hot gather, rotation = the motion's quarter-turn,
        giving the reference's exact rotated ±u↔v copies); corner-wedge
        nodes land off-lattice and use rotated bilinear interpolation."""
        N, H, d = self.N, self.H, self._d
        xs = self._lattice_1d(loc2[0])
        ys = self._lattice_1d(loc2[1])
        n0, n1 = xs.size, ys.size
        scalar = loc2 == (C, C)
        locA = loc2
        locB = (C, C) if scalar else (loc2[1], loc2[0])

        halo_mask = np.ones((n0, n1), bool)
        halo_mask[H:H + N, H:H + N] = False
        hij = np.argwhere(halo_mask)
        X, Y = np.meshgrid(xs, ys, indexing="ij")
        zh = (X[halo_mask] + 1j * Y[halo_mask])[None].repeat(6, 0)
        fo, zo, a = self._hop(zh)

        # my component direction expressed in the owner chart: d/dξ of the
        # composed motion is the constant a (holomorphic rigid motion).
        # Lattice A is this location's own lattice (owner's x-component
        # for u-maps, y-component for v-maps); B is the swapped one.
        if scalar:
            rA = np.ones(a.shape)
            rB = np.zeros(a.shape)
        elif loc2[0] is F:       # u-located: my x-direction = a
            rA, rB = a.real, a.imag
        else:                    # v-located: my y-direction = i·a
            dirc = 1j * a
            rA, rB = dirc.imag, dirc.real

        def frac(loc_src):
            sx = self._lattice_1d(loc_src[0])
            sy = self._lattice_1d(loc_src[1])
            fi = (zo.real - sx[0]) / d
            fj = (zo.imag - sy[0]) / d
            return fi, fj

        def entries(loc_src):
            fi, fj = frac(loc_src)
            ri, rj = np.round(fi), np.round(fj)
            exact = (np.abs(fi - ri) < 1e-6) & (np.abs(fj - rj) < 1e-6)
            lo, hi = H, H + N - 1
            i0 = np.clip(np.where(exact, ri, np.floor(fi)), lo, hi - 1).astype(int)
            j0 = np.clip(np.where(exact, rj, np.floor(fj)), lo, hi - 1).astype(int)
            wx = np.clip(np.where(exact, ri, fi) - i0, 0.0, 1.0)
            wy = np.clip(np.where(exact, rj, fj) - j0, 0.0, 1.0)
            return i0, j0, wx, wy

        iA, jA, wxA, wyA = entries(locA)
        if scalar:
            iB, jB, wxB, wyB = iA, jA, wxA, wyA
            rB = np.zeros_like(rA)
        else:
            iB, jB, wxB, wyB = entries(locB)

        J = jnp.asarray
        dt = self.dtype
        return _LocMap(
            (J(hij[:, 0]), J(hij[:, 1])), J(fo.astype(np.int32)),
            J(iA.astype(np.int32)), J(jA.astype(np.int32)),
            J(wxA, dt), J(wyA, dt), J(rA, dt),
            J(iB.astype(np.int32)), J(jB.astype(np.int32)),
            J(wxB, dt), J(wyB, dt), J(rB, dt))

    @staticmethod
    def _gather(data, f, i0, j0, wx, wy):
        wx = wx[:, :, None]
        wy = wy[:, :, None]
        g00 = data[f, i0, j0, :]
        g10 = data[f, i0 + 1, j0, :]
        g01 = data[f, i0, j0 + 1, :]
        g11 = data[f, i0 + 1, j0 + 1, :]
        return ((1 - wx) * (1 - wy) * g00 + wx * (1 - wy) * g10
                + (1 - wx) * wy * g01 + wx * wy * g11)

    def _lonlat(self, centers):
        x, y, z = centers[..., 0], centers[..., 1], centers[..., 2]
        self.longitude = jnp.asarray(np.degrees(np.arctan2(y, x)), self.dtype)
        self.latitude = jnp.asarray(np.degrees(np.arcsin(np.clip(z, -1, 1))),
                                    self.dtype)

    # -- shapes ---------------------------------------------------------------
    @property
    def total_shape(self):
        n = self.N + 2 * self.H
        return (6, n, n, self.Nz + 2 * self.Hz)

    @property
    def shape(self):
        return (6, self.N, self.N, self.Nz)

    def new_field(self, fill=0.0):
        return jnp.full(self.total_shape, fill, self.dtype)

    def interior(self, data):
        H, Hz = self.H, self.Hz
        return data[:, H:H + self.N, H:H + self.N, Hz:Hz + self.Nz]

    # -- halo filling ----------------------------------------------------------
    def fill_halos(self, data, vector_pair=None):
        """Inter-face halo exchange by precomputed gathers.

        Scalars (cell-centered): exact rotated index copies where halo
        nodes coincide with neighbour centers, bilinear in the corner
        wedges. Horizontal velocity pairs (``vector_pair=(u, v)``): the
        exchange samples both of the neighbour's components on their own
        staggered lattices and combines with the (snapped) tangent
        rotation — exact ±u↔v copies at rotated junctions, the analog of
        reference cubed_sphere_halo_filling.jl."""
        if vector_pair is None:
            m = self._maps[(C, C)]
            hi, hj = m.hij
            s = self._gather(data, m.f, m.iA, m.jA, m.wxA, m.wyA)
            return data.at[:, hi, hj, :].set(s)
        u, v = vector_pair
        mu = self._maps[(F, C)]
        mv = self._maps[(C, F)]
        hiu, hju = mu.hij
        uh = (mu.rA[:, :, None] * self._gather(u, mu.f, mu.iA, mu.jA, mu.wxA, mu.wyA)
              + mu.rB[:, :, None] * self._gather(v, mu.f, mu.iB, mu.jB, mu.wxB, mu.wyB))
        hiv, hjv = mv.hij
        vh = (mv.rA[:, :, None] * self._gather(v, mv.f, mv.iA, mv.jA, mv.wxA, mv.wyA)
              + mv.rB[:, :, None] * self._gather(u, mv.f, mv.iB, mv.jB, mv.wxB, mv.wyB))
        u = u.at[:, hiu, hju, :].set(uh)
        v = v.at[:, hiv, hjv, :].set(vh)
        return u, v

    # -- per-face grids (for vmap) --------------------------------------------
    def face_grids(self):
        """A stacked pytree of per-face grids: vmap model functions as
        ``jax.vmap(fn, in_axes=(0, 0))(grid.face_grids(), data)``."""
        return _FaceGrid(
            {k: v for k, v in self._dx.items()},
            {k: v for k, v in self._dy.items()},
            {k: v for k, v in self._az.items()},
            self._zaxis, self.N, self.H, self.Nz, self.Hz, self.dtype)

    def face_axes(self):
        """in_axes pytree for vmapping face_grids()."""
        fg = self.face_grids()
        return jax.tree_util.tree_map(
            lambda l: 0 if (getattr(l, "ndim", 0) > 0 and l.shape[0] == 6)
            else None, fg)

    def __repr__(self):
        return (f"CubedSphereGrid(6 × {self.N}×{self.N}×{self.Nz}, halo="
                f"{self.H}, radius={self.radius:g}, {self.map_kind})")


@jax.tree_util.register_pytree_node_class
class _FaceGrid:
    """Metric protocol over one face (leaves carry a leading face axis
    outside vmap; inside vmap they are per-face (X, Y, 1) arrays)."""

    curvilinear = True
    dist = (None, None, None)

    def __init__(self, dx, dy, az, zaxis, N, H, Nz, Hz, dtype):
        self._dx, self._dy, self._az = dx, dy, az
        self._zaxis = zaxis
        self.N, self.H, self.Nz, self.Hz = N, H, Nz, Hz
        self.dtype = dtype
        self.Nx = self.Ny = N
        self.Hx = self.Hy = H
        self.topology = (FULLY_CONNECTED, FULLY_CONNECTED, self._zaxis.topo)

    def tree_flatten(self):
        keys_dx = tuple(sorted(self._dx, key=repr))
        keys_dy = tuple(sorted(self._dy, key=repr))
        keys_az = tuple(sorted(self._az, key=repr))
        leaves = (tuple(self._dx[k] for k in keys_dx)
                  + tuple(self._dy[k] for k in keys_dy)
                  + tuple(self._az[k] for k in keys_az)
                  + (self._zaxis.cf, self._zaxis.cc, self._zaxis.dc, self._zaxis.df))
        static = (keys_dx, keys_dy, keys_az,
                  (self._zaxis.n, self._zaxis.h, self._zaxis.topo,
                   self._zaxis.regular, self._zaxis.extent),
                  self.N, self.H, self.Nz, self.Hz, self.dtype)
        return leaves, static

    @classmethod
    def tree_unflatten(cls, static, leaves):
        keys_dx, keys_dy, keys_az, zmeta, N, H, Nz, Hz, dtype = static
        i = 0
        dx = {k: leaves[i + j] for j, k in enumerate(keys_dx)}; i += len(keys_dx)
        dy = {k: leaves[i + j] for j, k in enumerate(keys_dy)}; i += len(keys_dy)
        az = {k: leaves[i + j] for j, k in enumerate(keys_az)}; i += len(keys_az)
        zaxis = _Axis(zmeta[0], zmeta[1], zmeta[2], leaves[i], leaves[i + 1],
                      leaves[i + 2], leaves[i + 3], zmeta[3], zmeta[4])
        return cls(dx, dy, az, zaxis, N, H, Nz, Hz, dtype)

    # metric protocol
    def dx(self, loc):
        return self._dx[(loc[0], loc[1])]

    def dy(self, loc):
        return self._dy[(loc[0], loc[1])]

    def dz(self, loc):
        arr = self._zaxis.dc if loc[2] is C else self._zaxis.df
        return arr.reshape(1, 1, -1)

    def spacing(self, axis, loc):
        return (self.dx, self.dy, self.dz)[axis](loc)

    def Az(self, loc):
        return self._az[(loc[0], loc[1])]

    def Ax(self, loc):
        return self.dy(loc) * self.dz(loc)

    def Ay(self, loc):
        return self.dx(loc) * self.dz(loc)

    def V(self, loc):
        return self.Az(loc) * self.dz(loc)

    @property
    def total_shape(self):
        n = self.N + 2 * self.H
        return (n, n, self.Nz + 2 * self.Hz)

    @property
    def shape(self):
        return (self.N, self.N, self.Nz)

    @property
    def halo(self):
        return (self.H, self.H, self.Hz)

    def interior(self, data):
        H, Hz = self.H, self.Hz
        return data[H:H + self.N, H:H + self.N, Hz:Hz + self.Nz]


def cubed_sphere_tracer_step(grid, c, u, v, dt, scheme):
    """One explicit tracer-advection step on the cubed sphere: exchange
    halos, then a vmapped per-face flux divergence (the reference's
    per-face kernel launching, cubed_sphere_kernel_launching.jl, becomes
    one batched call)."""
    from ..advection.fluxes import div_Uc

    c = grid.fill_halos(c)
    u, v = grid.fill_halos(u, vector_pair=(u, v))
    fg = grid.face_grids()

    def face_div(g, u_f, v_f, c_f):
        w0 = jnp.zeros_like(c_f)
        return -div_Uc(g, scheme, u_f, v_f, w0, c_f)

    G = jax.vmap(face_div, in_axes=(grid.face_axes(), 0, 0, 0))(fg, u, v, c)
    return c + dt * G
