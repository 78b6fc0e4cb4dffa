"""Microbenchmarks: roll vs slice stencils, axis cost anisotropy."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
shape = (n + 6, n + 6, n + 6)
x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)

def bench(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)

# single pass baselines
bench("copy (x*2)", lambda a: a * 2.0, x)
bench("1 roll axis0", lambda a: jnp.roll(a, 1, 0) * 2.0, x)
bench("1 roll axis2 (lanes)", lambda a: jnp.roll(a, 1, 2) * 2.0, x)
# chained stencil: 5-point WENO-ish along each axis
def chain(a, axis, k=6):
    out = a
    for s in range(1, k + 1):
        out = out + jnp.roll(a, s, axis) * (0.1 * s)
    return out
bench("6-roll chain axis0", lambda a: chain(a, 0), x)
bench("6-roll chain axis1", lambda a: chain(a, 1), x)
bench("6-roll chain axis2", lambda a: chain(a, 2), x)
# slice-based shift alternative (pad semantics, same shape via concat w/ self)
def shift_slice(a, s, axis):
    idx = [slice(None)] * 3
    idx[axis] = slice(s, None)
    tailidx = [slice(None)] * 3
    tailidx[axis] = slice(0, s)
    return jnp.concatenate([a[tuple(idx)], a[tuple(tailidx)]], axis=axis)
def chain_slice(a, axis, k=6):
    out = a
    for s in range(1, k + 1):
        out = out + shift_slice(a, s, axis) * (0.1 * s)
    return out
bench("6-slice chain axis0", lambda a: chain_slice(a, 0), x)
bench("6-slice chain axis2", lambda a: chain_slice(a, 2), x)
# many-term fused elementwise (no shifts): op-count cost
def poly(a, k=30):
    out = a
    for i in range(k):
        out = out * 1.0001 + 0.1
    return out
bench("30-op elementwise", poly, x)
