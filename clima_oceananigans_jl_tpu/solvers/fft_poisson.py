"""FFT-based Poisson solver on regular grids.

TPU re-design of /root/reference/src/Solvers/fft_based_poisson_solver.jl
(+ plan_transforms.jl, poisson_eigenvalues.jl:1-32): solves
(∇² + m)φ = b by eigenfunction expansion of the staggered 2nd-order
Laplacian. Per-axis transform by topology: FFT (periodic), DCT-II
(bounded / staggered-Neumann, via jax.scipy.fft — XLA lowers it to FFTs,
which is exactly the reference's own GPU trick of doing DCT with FFT +
index permutation, index_permutations.jl), none (flat).

Everything is jittable; eigenvalue arrays are precomputed grid constants.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import jax.scipy.fft as jfft

from ..grids.topology import BOUNDED, FLAT, PERIODIC


def poisson_eigenvalues(N, L, topo, dtype):
    """Positive eigenvalues −λ of the staggered 1D Laplacian
    (reference poisson_eigenvalues.jl)."""
    i = jnp.arange(N, dtype=dtype)
    d = L / N
    if topo is PERIODIC:
        return (2.0 * jnp.sin(i * jnp.pi / N) / d) ** 2
    if topo is BOUNDED:
        return (2.0 * jnp.sin(i * jnp.pi / (2 * N)) / d) ** 2
    return jnp.zeros((N,), dtype)


def _reshape_axis(arr, axis):
    shape = [1, 1, 1]
    shape[axis] = arr.shape[0]
    return arr.reshape(shape)


def _dct2_matrix(N, dtype):
    """Orthonormal DCT-II matrix C[k,n] = s_k cos(π(2n+1)k/2N)."""
    k = jnp.arange(N, dtype=dtype)[:, None]
    n = jnp.arange(N, dtype=dtype)[None, :]
    C = jnp.cos(jnp.pi * (2.0 * n + 1.0) * k / (2.0 * N))
    s = jnp.where(k == 0, jnp.sqrt(1.0 / N), jnp.sqrt(2.0 / N))
    return (s * C).astype(dtype)


def _rdft_matrix(N, dtype):
    """Orthonormal real-DFT matrix B (N×N): rows ordered by the
    wavenumber index of `_rdft_wavenumbers` — constant, then
    interleaved cos/sin pairs for k = 1..N/2−1, then the Nyquist
    (−1)ⁿ row for even N.  B is orthogonal (inverse = Bᵀ) and
    diagonalizes every symmetric circulant, so the periodic-axis
    Poisson transform becomes ONE real MXU matmul each way instead of a
    complex FFT — no half-spectrum bookkeeping, no complex arithmetic.
    """
    j = jnp.arange(N, dtype=dtype)[None, :]
    rows = [jnp.full((1, N), 1.0 / jnp.sqrt(jnp.asarray(float(N), dtype)))]
    for k in range(1, (N - 1) // 2 + 1):
        ang = 2.0 * jnp.pi * k * j / N
        s = jnp.sqrt(jnp.asarray(2.0 / N, dtype))
        rows.append(s * jnp.cos(ang))
        rows.append(s * jnp.sin(ang))
    if N % 2 == 0:
        rows.append((jnp.where(jnp.arange(N) % 2 == 0, 1.0, -1.0)[None, :]
                     / jnp.sqrt(jnp.asarray(float(N), dtype))).astype(dtype))
    return jnp.concatenate(rows, 0).astype(dtype)


def _rdft_wavenumbers(N):
    """Wavenumber index of each `_rdft_matrix` row (for eigenvalue
    reordering): [0, 1, 1, 2, 2, …, N/2]."""
    kk = [0]
    for k in range(1, (N - 1) // 2 + 1):
        kk += [k, k]
    if N % 2 == 0:
        kk.append(N // 2)
    return jnp.asarray(kk)


#: MXU pass count for the fp32 transform matmuls. HIGHEST (bf16_6x,
#: beyond-fp32 accuracy) is the default; CLIMA_FFT_PRECISION=high picks
#: bf16_3x (~fp32-comparable, ~2× the MXU rate) — measured on v5e the
#: 256³ projection residual grows from ~1e-6 to ~4e-6 of the velocity
#: scale, and the solver-level Poisson residual test still passes.
import os as _os
_PRECISION = {"high": jax.lax.Precision.HIGH,
              "default": jax.lax.Precision.DEFAULT}.get(
    _os.environ.get("CLIMA_FFT_PRECISION", "highest"),
    jax.lax.Precision.HIGHEST)


def _matmul_along(b, M, axis):
    """Apply M (K×N) along `axis` of b: out[...,k,...] = Σ_n M[k,n] b[n].
    One MXU contraction — on TPU this beats the FFT lowering by ~an
    order of magnitude in both traffic and time for N ≤ ~1024.
    Precision HIGHEST keeps the transform at fp32 accuracy (multi-pass
    bf16 on the MXU); the matmuls are far from the HBM roofline so the
    extra passes are free."""
    out = jnp.tensordot(b, M, axes=[[axis], [1]],
                        preferred_element_type=b.dtype,
                        precision=_PRECISION)
    return jnp.moveaxis(out, -1, axis)


#: Override for the MXU-matmul transform path: None = auto (TPU only),
#: True/False force it on/off (tests force True on CPU for coverage).
FORCE_MXU = None


def _use_mxu_dct(b, axis):
    if FORCE_MXU is not None:
        return FORCE_MXU and not jnp.iscomplexobj(b)
    return (jax.default_backend() == "tpu" and not jnp.iscomplexobj(b)
            and b.shape[axis] <= 1024)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FFTPoissonSolver:
    """Interior-shaped solve: rhs (Nx,Ny,Nz) → φ (Nx,Ny,Nz), mean(φ)=0."""

    eigenvalues: tuple
    topology: tuple
    dtype: object

    @classmethod
    def build(cls, grid):
        if not grid.all_regular:
            raise ValueError("FFTPoissonSolver requires a fully regular grid "
                             "(use FourierTridiagonalSolver for stretched z)")
        eig = tuple(
            _reshape_axis(
                poisson_eigenvalues(grid.shape[a],
                                    grid.shape[a] * float(grid._axes[a].dc[0])
                                    if grid.topology[a] is not FLAT else 1.0,
                                    grid.topology[a], grid.dtype), a)
            for a in range(3))
        return cls(eig, grid.topology, grid.dtype)

    def tree_flatten(self):
        return (self.eigenvalues,), (self.topology, self.dtype)

    @classmethod
    def tree_unflatten(cls, static, leaves):
        return cls(leaves[0], static[0], static[1])

    def _axes_of(self, topo):
        return tuple(a for a in range(3) if self.topology[a] is topo)

    def solve(self, rhs, m=0.0):
        """(∇² + m)φ = rhs (interior arrays, no halos). On TPU every
        transform axis is ONE real orthogonal matmul each way on the MXU
        (DCT-II for bounded, real-DFT for periodic — see _rdft_matrix);
        elsewhere the first periodic axis uses a real FFT (halved
        spectrum) and the rest complex FFTs."""
        dct_axes = self._axes_of(BOUNDED)
        all_fft_axes = self._axes_of(PERIODIC)
        eig = list(self.eigenvalues)

        b = rhs
        mm_axes = tuple(a for a in all_fft_axes if _use_mxu_dct(rhs, a))
        for a in mm_axes:
            n_a = b.shape[a]
            b = _matmul_along(b, _rdft_matrix(n_a, b.dtype), a)
            kk = _rdft_wavenumbers(n_a)
            eig[a] = jnp.take(eig[a], kk, axis=a)
        fft_axes = tuple(a for a in all_fft_axes if a not in mm_axes)
        for a in dct_axes:
            if _use_mxu_dct(b, a):
                b = _matmul_along(b, _dct2_matrix(b.shape[a], b.dtype), a)
            else:
                b = jfft.dct(b, type=2, axis=a, norm="ortho")
        use_rfft = bool(fft_axes) and not jnp.iscomplexobj(b)
        r_axis = fft_axes[0] if use_rfft else None
        c_axes = tuple(a for a in fft_axes if a != r_axis)
        if use_rfft:
            n_r = b.shape[r_axis]
            b = jnp.fft.rfft(b, axis=r_axis)
        if c_axes:
            b = jnp.fft.fftn(b, axes=c_axes)

        if use_rfft:
            sl = [slice(None)] * 3
            sl[r_axis] = slice(0, n_r // 2 + 1)
            eig[r_axis] = eig[r_axis][tuple(sl)]
        lam = eig[0] + eig[1] + eig[2]
        denom = lam - m
        phi = -b / jnp.where(denom == 0, jnp.ones_like(denom), denom)
        if m == 0.0:
            # zero the undetermined mean mode (reference solve! :108-111)
            phi = phi.at[0, 0, 0].set(0.0)

        if c_axes:
            phi = jnp.fft.ifftn(phi, axes=c_axes)
        if use_rfft:
            phi = jnp.fft.irfft(phi, n=n_r, axis=r_axis)
        phi = jnp.real(phi) if jnp.iscomplexobj(phi) else phi
        for a in reversed(dct_axes):
            if _use_mxu_dct(phi, a):
                # orthonormal inverse = Cᵀ: out[n] = Σ_k C[k,n] φ[k]
                phi = _matmul_along(phi, _dct2_matrix(phi.shape[a],
                                                      phi.dtype).T, a)
            else:
                phi = jfft.idct(phi, type=2, axis=a, norm="ortho")
        for a in reversed(mm_axes):
            phi = _matmul_along(phi, _rdft_matrix(phi.shape[a], phi.dtype).T, a)
        return phi.astype(self.dtype)
