"""S2 point-sample grid transforms for spherical activations.

TPU-native replacement for e3nn's ``ToS2Grid`` / ``FromS2Grid`` as used by the
reference ``SO3_Grid`` (reference models/EquiformerV2Functions/so3.py:552-646).

Construction (numpy, float64, cached per (lmax, mmax, resolution)):
* latitudes: Gauss-Legendre nodes in cos(beta) — quadrature-exact for
  band-limited signals (the reference's e3nn grid uses uniform latitudes with
  fitted quadrature weights; Gauss-Legendre needs fewer points for the same
  exactness);
* longitudes: uniform, trapezoid-exact for the azimuthal Fourier modes.

Scaling: ``to_grid`` evaluates ``f(x) = sum_i c_i * Y_i(x) * s`` with
``s = sqrt(4 pi) / (lmax + 1)`` so that i.i.d. unit-variance coefficients give
unit-variance grid values (the intent of e3nn's 'component' normalization —
keeps the SiLU on the grid operating at the right scale).  ``from_grid`` is the
exact quadrature inverse, so ``from_grid(to_grid(c)) == c`` for band-limited c.

The mmax-truncation rescale sqrt((2l+1)/(2 mmax + 1)) for l > mmax is applied
to both matrices exactly as the reference does (so3.py:592-618).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .irreps import layout as get_layout
from .sph import real_sph_harm

__all__ = ["S2Grid", "s2grid"]


class S2Grid:
    """Precomputed grid transform matrices for one (lmax, mmax)."""

    def __init__(self, lmax: int, mmax: int, resolution: int | None = None):
        self.lmax = lmax
        self.mmax = mmax
        self.cache_key = (lmax, mmax, resolution)
        if resolution is not None:
            res_beta = res_alpha = int(resolution)
        else:
            res_beta = 2 * (lmax + 1)
            # reference so3.py:571-575
            res_alpha = 2 * mmax + 1 + (2 if lmax == mmax else 0)
        self.res_beta = res_beta
        self.res_alpha = res_alpha

        # Gauss-Legendre latitudes (z = cos beta), uniform longitudes.
        z_nodes, z_weights = np.polynomial.legendre.leggauss(res_beta)
        alphas = 2.0 * math.pi * np.arange(res_alpha) / res_alpha

        zz = np.repeat(z_nodes, res_alpha)
        aa = np.tile(alphas, res_beta)
        ss = np.sqrt(np.maximum(0.0, 1.0 - zz**2))
        pts = np.stack([ss * np.cos(aa), ss * np.sin(aa), zz], axis=-1)

        K = (lmax + 1) ** 2
        # constant-table build; ensure_compile_time_eval so construction
        # inside an abstract trace (jax.eval_shape of model.init — e.g. the
        # partition-spec derivation, parallel/sharding.py) stays concrete
        with jax.ensure_compile_time_eval():
            Y = np.asarray(
                real_sph_harm(lmax, jnp.asarray(pts, dtype=jnp.float32)),
                dtype=np.float64,
            ).reshape(res_beta, res_alpha, K)

        scale = math.sqrt(4.0 * math.pi) / (lmax + 1)
        to_grid = Y * scale  # [b, a, i]

        # quadrature: int f Y_i dOmega = sum_b w_b (2 pi / res_a) sum_a f Y_i
        w = z_weights[:, None, None] * (2.0 * math.pi / res_alpha)
        from_grid = Y * w / scale  # [b, a, i]

        # mmax truncation rescale (reference so3.py:592-618)
        if mmax < lmax:
            for l in range(mmax + 1, lmax + 1):
                f = math.sqrt((2 * l + 1) / (2 * mmax + 1))
                sl = slice(l * l, l * l + 2 * l + 1)
                to_grid[:, :, sl] *= f
                from_grid[:, :, sl] *= f

        keep = get_layout(lmax, mmax).full_indices
        # ensure_compile_time_eval: these jnp constants are CACHED (lru_cache
        # on s2grid) — created inside an ambient trace they would be tracers
        # and leak into later traces (UnexpectedTracerError when a second
        # test/model reuses the cached grid)
        with jax.ensure_compile_time_eval():
            self.to_grid_mat = jnp.asarray(
                to_grid[:, :, keep], dtype=jnp.float32
            )
            self.from_grid_mat = jnp.asarray(
                from_grid[:, :, keep], dtype=jnp.float32
            )
            # full (mmax = lmax) variants for the FFN grid path
            self.to_grid_mat_full = jnp.asarray(to_grid, dtype=jnp.float32)
            self.from_grid_mat_full = jnp.asarray(from_grid, dtype=jnp.float32)

    def to_grid(self, x):
        """[N, K_red, C] coefficients -> [N, b, a, C] grid values."""
        return jnp.einsum(
            "bai,nic->nbac", self.to_grid_mat.astype(x.dtype), x
        )

    def from_grid(self, g):
        """[N, b, a, C] grid values -> [N, K_red, C] coefficients."""
        return jnp.einsum(
            "bai,nbac->nic", self.from_grid_mat.astype(g.dtype), g
        )


@functools.lru_cache(maxsize=None)
def s2grid(lmax: int, mmax: int, resolution: int | None = None) -> S2Grid:
    return S2Grid(lmax, mmax, resolution)
