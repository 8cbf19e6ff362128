"""Setup-time (numpy, float64) Wigner matrices — computed from scratch.

The reference loads precomputed e3nn ``Jd.pt`` J-matrices that are *not in the
repo* (reference models/EquiformerV2Functions/wigner.py:9) and reconstructs
Wigner-D as ``Xa @ J @ Xb @ J @ Xc``.  We regenerate everything ourselves:

1. complex Wigner little-d ``d^l_{m'm}(beta)`` from the explicit factorial sum
   (exact integer factorials, evaluated in float64 — fine for l <= ~12);
2. the unitary complex->real change of basis ``U`` for real spherical
   harmonics (ordering m = -l..l, no Condon-Shortley in the real basis);
3. real Wigner-D for arbitrary ZYZ Euler angles,
   ``D(R_z(a) R_y(b) R_z(g))``;
4. the involutive J matrices ``J_l = D_l(pi/2, pi/2, pi/2)`` — the real
   Wigner-D of the 180-degree rotation about (0, 1, 1)/sqrt(2), which swaps the
   y and z axes.  At runtime (ops/rotation.py) Wigner-D for per-edge rotations
   is assembled as ``Xz(a) @ J @ Xz(b) @ J @ Xz(g)`` in pure jnp.

Convention: ``D(R)`` is the matrix such that for the real spherical-harmonic
vector ``Y(x)`` (degree l block), ``Y(R x) = D(R) Y(x)``; equivalently,
coefficients of a function transform as ``c' = D(R) c`` when the function is
rotated by ``R`` (``f'(x) = f(R^{-1} x)``).  ZYZ decomposition:
``R = R_z(alpha) R_y(beta) R_z(gamma)``.
"""

from __future__ import annotations

import functools
import math

import numpy as np

__all__ = [
    "complex_wigner_d",
    "real_to_complex_U",
    "real_wigner_d_matrix",
    "real_wigner_D_angles",
    "J_matrix",
    "J_matrices",
    "z_rot_mat_np",
]


@functools.lru_cache(maxsize=None)
def _fact(n: int) -> int:
    return math.factorial(n)


def complex_wigner_d(l: int, beta: float) -> np.ndarray:
    """Complex Wigner little-d ``d^l_{m'm}(beta)``, indices ordered -l..l.

    Standard Wigner formula (z-y-z convention,
    ``D^l_{m'm}(a,b,g) = e^{-i m' a} d^l_{m'm}(b) e^{-i m g}``).
    """
    d = np.zeros((2 * l + 1, 2 * l + 1), dtype=np.float64)
    cb2 = math.cos(beta / 2.0)
    sb2 = math.sin(beta / 2.0)
    for mp in range(-l, l + 1):
        for m in range(-l, l + 1):
            pref = math.sqrt(
                _fact(l + mp) * _fact(l - mp) * _fact(l + m) * _fact(l - m)
            )
            kmin = max(0, m - mp)
            kmax = min(l - mp, l + m)
            s = 0.0
            for k in range(kmin, kmax + 1):
                denom = (
                    _fact(l - mp - k)
                    * _fact(l + m - k)
                    * _fact(k + mp - m)
                    * _fact(k)
                )
                p1 = 2 * l + m - mp - 2 * k
                p2 = mp - m + 2 * k
                term = ((-1.0) ** (k + mp - m)) / denom
                term *= cb2 ** p1 if p1 else 1.0
                term *= sb2 ** p2 if p2 else 1.0
                s += term
            d[mp + l, m + l] = pref * s
    return d


@functools.lru_cache(maxsize=None)
def real_to_complex_U(l: int) -> np.ndarray:
    """Unitary ``U`` with ``Y_real = U @ Y_complex`` (rows: real m, cols: cplx m).

    Real basis (no Condon-Shortley in the *real* functions; the complex
    ``Y_l^m`` carry CS phase):
        Y_{l,0}   = Y_l^0
        Y_{l,m}   = ((-1)^m Y_l^m + Y_l^{-m}) / sqrt(2)         (m > 0)
        Y_{l,-m}  = ((-1)^m Y_l^m - Y_l^{-m}) / (i sqrt(2))     (m > 0)
    """
    U = np.zeros((2 * l + 1, 2 * l + 1), dtype=np.complex128)
    s2 = 1.0 / math.sqrt(2.0)
    U[l, l] = 1.0
    for m in range(1, l + 1):
        cs = (-1.0) ** m
        # row for real +m (cosine component)
        U[l + m, l + m] = cs * s2
        U[l + m, l - m] = s2
        # row for real -m (sine component): 1/(i sqrt2) = -i/sqrt2
        U[l - m, l + m] = cs * (-1j) * s2
        U[l - m, l - m] = -(-1j) * s2
    return U


def real_wigner_d_matrix(l: int, beta: float) -> np.ndarray:
    """Real-basis Wigner-d for a rotation about y by ``beta``."""
    U = real_to_complex_U(l)
    d = complex_wigner_d(l, beta).astype(np.complex128)
    Dr = U @ d @ U.conj().T
    assert np.abs(Dr.imag).max() < 1e-10
    return Dr.real


def z_rot_mat_np(l: int, angle: float) -> np.ndarray:
    """Real-basis Wigner-D of ``R_z(angle)`` (see ops/rotation.py for jnp)."""
    X = np.zeros((2 * l + 1, 2 * l + 1), dtype=np.float64)
    for m in range(-l, l + 1):
        X[l + m, l + m] = math.cos(m * angle)
        if m != 0:
            X[l + m, l - m] = -math.sin(m * angle)
    return X


def real_wigner_D_angles(l: int, alpha: float, beta: float, gamma: float) -> np.ndarray:
    """Real Wigner-D of ``R_z(alpha) R_y(beta) R_z(gamma)``."""
    return z_rot_mat_np(l, alpha) @ real_wigner_d_matrix(l, beta) @ z_rot_mat_np(l, gamma)


@functools.lru_cache(maxsize=None)
def J_matrix(l: int) -> np.ndarray:
    """``J_l``: real Wigner-D of the involution swapping the y and z axes.

    ``R_J = R_z(pi/2) R_y(pi/2) R_z(pi/2) = [[-1,0,0],[0,0,1],[0,1,0]]``,
    ``R_J^2 = I``, and ``R_J R_z(b) R_J = R_y(b)`` — so
    ``D(R) = Xz(a) J Xz(b) J Xz(g)``.
    """
    J = real_wigner_D_angles(l, math.pi / 2, math.pi / 2, math.pi / 2)
    # enforce exactness properties
    assert np.allclose(J @ J, np.eye(2 * l + 1), atol=1e-10)
    return J


def J_matrices(lmax: int) -> list[np.ndarray]:
    return [J_matrix(l) for l in range(lmax + 1)]
