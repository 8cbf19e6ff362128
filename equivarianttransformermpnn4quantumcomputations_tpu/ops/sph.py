"""Real spherical harmonics, evaluated in pure jnp (jit-safe, no e3nn).

Replaces the reference's uses of ``e3nn.o3.SphericalHarmonics``
(reference models/equiformerv2_MatPES_GATAV2.py:137-140, 232-241) and provides
the grid samples for the S2 activation tables (ops/s2grid.py).

Everything is evaluated from Cartesian components through singularity-free
recurrences (the ``P_l^m / sin^m(beta)`` polynomials), so the functions are
smooth in (x, y, z) everywhere including the poles and can be traced/grad'ed.

Basis: real SH ordered ``m = -l..l`` (sine components at -m, cosine at +m),
*without* Condon-Shortley phase in the real functions — consistent with the
``U`` matrix in ops/wigner_np.py, so ``Y(R x) = D(R) Y(x)`` holds with the
Wigner matrices from ops/rotation.py.

Normalizations (mirroring the e3nn names used by the reference):
* ``integral``:  orthonormal, ``\\int Y_i Y_j dOmega = delta_ij``
* ``norm``:      ``sum_m Y_lm(x)^2 = 1``  (used for rl_ij edge features)
* ``component``: ``sum_m Y_lm(x)^2 = 2l+1``
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = ["real_sph_harm", "sph_norm_scale"]


def sph_norm_scale(lmax: int, normalization: str) -> np.ndarray:
    """Per-coefficient scale from 'integral' to the requested normalization."""
    scale = np.ones((lmax + 1) ** 2, dtype=np.float64)
    for l in range(lmax + 1):
        if normalization == "integral":
            f = 1.0
        elif normalization == "norm":
            f = math.sqrt(4.0 * math.pi / (2 * l + 1))
        elif normalization == "component":
            f = math.sqrt(4.0 * math.pi)
        else:
            raise ValueError(normalization)
        scale[l * l : l * l + 2 * l + 1] = f
    return scale


def real_sph_harm(lmax: int, vec, normalization: str = "integral"):
    """Evaluate real SH of unit vectors.

    Args:
        lmax: maximum degree (python int, static).
        vec: [..., 3] array of unit vectors.
        normalization: 'integral' | 'norm' | 'component'.

    Returns:
        [..., (lmax+1)**2] array, l-primary layout (index l^2+l+m).
    """
    x = vec[..., 0]
    y = vec[..., 1]
    z = vec[..., 2]

    # azimuthal cosine/sine times u^m:  C_m = u^m cos(m phi), S_m = u^m sin(m phi)
    C = [jnp.ones_like(x)]
    S = [jnp.zeros_like(x)]
    for m in range(1, lmax + 1):
        C.append(x * C[m - 1] - y * S[m - 1])
        S.append(x * S[m - 1] + y * C[m - 1])

    # Q_{l,m} = P_l^m(z) / u^m  (Condon-Shortley-free), polynomial in z.
    # Q[m][l-m] holds Q_{l,m}.
    Q = {}
    for m in range(0, lmax + 1):
        col = []
        # Q_{m,m} = (2m-1)!!
        qmm = float(np.prod(np.arange(1, 2 * m, 2))) if m > 0 else 1.0
        col.append(jnp.full_like(z, qmm))
        if m + 1 <= lmax:
            col.append((2 * m + 1) * z * col[0])
        for l in range(m + 2, lmax + 1):
            col.append(
                ((2 * l - 1) * z * col[l - m - 1] - (l + m - 1) * col[l - m - 2])
                / (l - m)
            )
        Q[m] = col

    scale = sph_norm_scale(lmax, normalization)
    out = []
    for l in range(lmax + 1):
        row = [None] * (2 * l + 1)
        for m in range(0, l + 1):
            k = math.sqrt(
                (2 * l + 1)
                / (4.0 * math.pi)
                * math.factorial(l - m)
                / math.factorial(l + m)
            )
            if m == 0:
                row[l] = k * Q[0][l]
            else:
                kk = math.sqrt(2.0) * k
                row[l + m] = kk * Q[m][l - m] * C[m]
                row[l - m] = kk * Q[m][l - m] * S[m]
        for m in range(-l, l + 1):
            row[l + m] = row[l + m] * scale[l * l + l + m]
        out.extend(row)
    return jnp.stack(out, axis=-1)
