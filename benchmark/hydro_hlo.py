"""Per-instruction byte accounting of the compiled hydrostatic ¼° step
(the hydrostatic analog of hlo_breakdown.py — see that module's caveats).

    python benchmark/hydro_hlo.py [nx ny nz] [top]
"""
import os, re, sys, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1440
ny = int(sys.argv[2]) if len(sys.argv) > 2 else 600
nz = int(sys.argv[3]) if len(sys.argv) > 3 else 24
top = int(sys.argv[4]) if len(sys.argv) > 4 else 40

from clima_oceananigans_jl_tpu.grids.latlon import LatitudeLongitudeGrid
from clima_oceananigans_jl_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
from clima_oceananigans_jl_tpu.models.free_surface import SplitExplicitFreeSurface
from clima_oceananigans_jl_tpu.coriolis.coriolis import HydrostaticSphericalCoriolis
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.advection.vector_invariant import VectorInvariant
from clima_oceananigans_jl_tpu.advection.schemes import WENO5

k = np.arange(nz + 1)
z_faces = -3000.0 * (1.0 - k / nz) ** 1.8
grid = LatitudeLongitudeGrid(size=(nx, ny, nz), longitude=(0, 360),
                             latitude=(-75, 75), z=z_faces, dtype=jnp.float32)
model = HydrostaticFreeSurfaceModel(
    grid, momentum_advection=VectorInvariant(scheme="weno_velocity"),
    tracer_advection=WENO5(), tracers=("T", "S"),
    free_surface=SplitExplicitFreeSurface(substeps=30),
    coriolis=HydrostaticSphericalCoriolis(), buoyancy=BuoyancyTracer(),
    fused_advection=True)
print("state_layout:", model.state_layout, flush=True)
state = jax.eval_shape(model.initial_state)
state = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), state)
comp = jax.jit(model.step, donate_argnums=0).lower(
    state, jnp.float32(600.0)).compile()
ca = comp.cost_analysis()
ca = ca[0] if isinstance(ca, (list, tuple)) else ca
print(f"cost_analysis: bytes={ca.get('bytes accessed', 0)/1e9:.2f} GB "
      f"flops={ca.get('flops', 0)/1e9:.1f} G", flush=True)
txt = comp.as_text()

ITEM = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
        "pred": 1, "s8": 1, "u8": 1, "c64": 8, "c128": 16}
shape_re = re.compile(r"\b(f32|f64|bf16|f16|s32|u32|s8|u8|pred|c64|c128)\[([0-9,]*)\]")
op_re = re.compile(r"^\s*(?:ROOT\s+)?(%[\w.\-]+)\s*=\s*(.*)$")
kind_re = re.compile(r"(?:^|\s)([a-z][a-z\-]{2,})\(")
ref_re = re.compile(r"%[\w.\-]+")


def result_bytes(typestr):
    tot = 0
    for dt, dims in shape_re.findall(typestr):
        nelem = 1
        for d in dims.split(","):
            if d:
                nelem *= int(d)
        tot += nelem * ITEM[dt]
    return tot


lines = txt.splitlines()
i0 = next((k for k, l in enumerate(lines) if l.startswith("ENTRY")), None)
if i0 is None:
    sys.exit("no ENTRY computation found")
sizes, rows = {}, []
by_kind = collections.Counter()
for line in lines[i0 + 1:]:
    if line.startswith("}"):
        break
    m = op_re.match(line)
    if not m:
        continue
    name, rest = m.groups()
    rest_nometa = rest.split(", metadata=")[0].split(", calls=")[0]
    km = kind_re.search(rest_nometa)
    kind = km.group(1) if km else "?"
    rb = result_bytes(rest_nometa[:km.start()] if km else rest_nometa)
    sizes[name] = rb
    if kind in ("parameter", "constant", "tuple", "get-tuple-element",
                "bitcast", "?"):
        continue
    args = rest_nometa[km.end():]
    reads = sum(sizes.get(r, 0) for r in ref_re.findall(args))
    tot = rb + reads
    rows.append((tot, kind, name.lstrip("%")))
    by_kind[kind] += tot

rows.sort(reverse=True)
print(f"== entry computation: {len(rows)} costed instructions, "
      f"{sum(b for b, _, _ in rows)/1e9:.2f} GB touched (upper bound)")
print("== by opcode:")
for kind, b in by_kind.most_common(15):
    print(f"  {kind:28s} {b/1e9:8.3f} GB")
print(f"== top {top} instructions:")
for b, kind, name in rows[:top]:
    print(f"  {b/1e9:7.3f} GB  {kind:24s} {name}")
