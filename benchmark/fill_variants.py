import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np

n = 256; H = 3; HY = 4
shape = (n + 2*H, n + 2*HY, n + 2*H)
x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)

def bench(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.3f} ms", flush=True)

def S(axis, sl):
    idx = [slice(None)]*3; idx[axis] = sl; return tuple(idx)

def fill_concat(a):
    for axis, h in ((0, H), (1, HY), (2, H)):
        N = a.shape[axis] - 2*h
        a = jnp.concatenate([a[S(axis, slice(N, N+h))],
                             a[S(axis, slice(h, N+h))],
                             a[S(axis, slice(h, 2*h))]], axis=axis)
    return a

def fill_dus(a):
    for axis, h in ((0, H), (1, HY), (2, H)):
        N = a.shape[axis] - 2*h
        a = a.at[S(axis, slice(0, h))].set(a[S(axis, slice(N, N+h))])
        a = a.at[S(axis, slice(N+h, N+2*h))].set(a[S(axis, slice(h, 2*h))])
    return a

idxs = []
for axis, h in ((0, H), (1, HY), (2, H)):
    Nn = shape[axis] - 2*h
    idx = np.arange(shape[axis]); inter = idx[h:h+Nn]
    wrapped = np.concatenate([inter[-h:], inter, inter[:h]])
    idxs.append(jnp.asarray(wrapped))

def fill_take(a):
    a = jnp.take(a, idxs[0], axis=0)
    a = jnp.take(a, idxs[1], axis=1)
    a = jnp.take(a, idxs[2], axis=2)
    return a

def fill_roll_where(a):
    # periodic: single fused expression with masks + rolls
    for axis, h in ((0, H), (1, HY), (2, H)):
        Nn = a.shape[axis] - 2*h
        i = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
        left = i < h
        right = i >= Nn + h
        a = jnp.where(left, jnp.roll(a, -Nn, axis),
                      jnp.where(right, jnp.roll(a, Nn, axis), a))
    return a

bench("concat (current)", fill_concat, x)
bench("2x DUS per axis", fill_dus, x)
bench("take per axis", fill_take, x)
bench("roll+where", fill_roll_where, x)
# 4 fields at once, stacked
xs = jnp.stack([x, x, x, x])
def fill_stacked(a):
    for axis, h in ((1, H), (2, HY), (3, H)):
        N = a.shape[axis] - 2*h
        sl = lambda s: tuple(sl_ if i != axis else s for i, sl_ in enumerate([slice(None)]*4))
        a = jnp.concatenate([a[sl(slice(N, N+h))], a[sl(slice(h, N+h))], a[sl(slice(h, 2*h))]], axis=axis)
    return a
bench("concat 4-stacked", fill_stacked, xs)
