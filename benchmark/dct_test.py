import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import jax.scipy.fft as jfft

n = 256
x = jax.random.normal(jax.random.PRNGKey(0), (n, n, n), jnp.float32)

def bench(name, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)
    return out

bench("jfft.dct z", lambda a: jfft.dct(a, type=2, axis=2, norm="ortho"), x)
bench("rfft x", lambda a: jnp.fft.rfft(a, axis=0), x)
xc = jnp.fft.rfft(x, axis=0)
bench("fft y (complex in)", lambda a: jnp.fft.fft(a, axis=1), xc)

# permutation+twiddle DCT-II along the last axis
N = n
k = jnp.arange(N // 2 + 1)
tw = 2.0 * jnp.exp(-1j * jnp.pi * k / (2 * N))
def fast_dct(a):
    v = jnp.concatenate([a[..., 0::2], a[..., 1::2][..., ::-1]], axis=-1)
    V = jnp.fft.rfft(v, axis=-1)
    X = jnp.real(V * tw)
    # extend to all N coefficients: X_k for k>N/2 from conj symmetry
    Xfull = jnp.concatenate([X, -jnp.imag(V[..., 1:N - N//2] *
                             (2.0 * jnp.exp(-1j*jnp.pi*jnp.arange(1, N - N//2)/(2*N))))[..., ::-1]], axis=-1)
    return Xfull
out1 = bench("fast dct z", fast_dct, x)
ref = jfft.dct(x, type=2, axis=2, norm=None)
print("match:", bool(jnp.allclose(out1, ref, atol=2e-2 * float(jnp.abs(ref).max()))),
      float(jnp.abs(out1 - ref).max()), float(jnp.abs(ref).max()), flush=True)
