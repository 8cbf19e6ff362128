"""Static (l, m) layout bookkeeping for flattened spherical-harmonic feature axes.

TPU-native replacement for the reference ``CoefficientMappingModule``
(reference: models/EquiformerV2Functions/so3.py:45-199).  The reference builds
torch buffers and a dense ``to_m`` permutation *matrix* applied by matmul; here
everything is a static numpy index table computed once at trace time, and the
l-primary <-> m-primary reshuffle is a gather with a precomputed permutation
(free on TPU — XLA folds it into the surrounding ops).

Layout convention
-----------------
Features live on a flattened coefficient axis of size ``num_coefficients``:

* **l-primary** (the resting layout): index ``l**2 + l + m`` for the full
  (mmax = lmax) case, i.e. degrees stacked ``l = 0..lmax``, orders ``m = -l..l``
  ascending within each degree.  When ``mmax < lmax`` only ``|m| <= mmax``
  coefficients are kept, in the same relative order.
* **m-primary** (the SO(2)-conv layout): ``m = 0`` block first (one coefficient
  per degree ``l = 0..lmax``), then for each ``m = 1..mmax`` the ``+m`` ("real")
  coefficients for ``l = m..lmax`` followed by the ``-m`` ("imag")
  coefficients.

Under a rotation about the z axis by angle theta, the pair
``(c_{+m}, c_{-m})`` behaves as the complex number ``c_{+m} + i c_{-m}``
multiplied by ``exp(i m theta)`` — the algebraic fact the eSCN SO(2)
convolution exploits (reference so2_ops.py:53-61).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

__all__ = ["IrrepsLayout", "layout"]


@dataclass(frozen=True)
class IrrepsLayout:
    """Immutable index tables for one ``(lmax, mmax)`` resolution.

    All members are plain numpy arrays (hashable identity via ``(lmax, mmax)``)
    so the object can be closed over by jitted functions without becoming a
    traced value.
    """

    lmax: int
    mmax: int

    # Per-coefficient degree / signed order, over the *kept* coefficients.
    l_harmonic: np.ndarray = field(repr=False)  # [K]
    m_complex: np.ndarray = field(repr=False)   # [K] signed m
    # Permutation: m_primary = x[..., to_m_perm, :]
    to_m_perm: np.ndarray = field(repr=False)   # [K]
    # Inverse permutation: l_primary = x_m[..., from_m_perm, :]
    from_m_perm: np.ndarray = field(repr=False)  # [K]
    # Number of degrees having each order m (0..mmax): m_size[m] = lmax - m + 1.
    m_size: np.ndarray = field(repr=False)       # [mmax+1]
    # Indices into the FULL (lmax+1)^2 l-primary layout of the kept coeffs.
    full_indices: np.ndarray = field(repr=False)  # [K]
    # sqrt((2l+1)/(2*mmax+1)) per full coefficient for l > mmax, else 1
    # (reference so3.py:175-195 rotate-inv rescale).
    rescale: np.ndarray = field(repr=False)       # [(lmax+1)**2]

    @property
    def num_coefficients(self) -> int:
        return int(self.l_harmonic.shape[0])

    @property
    def num_coefficients_full(self) -> int:
        return (self.lmax + 1) ** 2

    # -- degree slices in the full l-primary layout -------------------------
    def degree_slice(self, l: int) -> slice:
        return slice(l * l, l * l + 2 * l + 1)

    def __hash__(self):
        return hash((self.lmax, self.mmax))

    def __eq__(self, other):
        return (
            isinstance(other, IrrepsLayout)
            and self.lmax == other.lmax
            and self.mmax == other.mmax
        )


@functools.lru_cache(maxsize=None)
def layout(lmax: int, mmax: int | None = None) -> IrrepsLayout:
    """Build (and cache) the layout tables for ``(lmax, mmax)``."""
    if mmax is None:
        mmax = lmax
    assert 0 <= mmax <= lmax

    l_list, m_list, full_idx = [], [], []
    for l in range(lmax + 1):
        mm = min(l, mmax)
        for m in range(-mm, mm + 1):
            l_list.append(l)
            m_list.append(m)
            full_idx.append(l * l + l + m)
    l_harmonic = np.asarray(l_list, dtype=np.int32)
    m_complex = np.asarray(m_list, dtype=np.int32)
    full_indices = np.asarray(full_idx, dtype=np.int32)
    K = l_harmonic.shape[0]

    # m-primary permutation over kept coefficients.
    perm = []
    m_size = np.zeros(mmax + 1, dtype=np.int32)
    # m = 0 block
    idx = np.arange(K)
    for m in range(0, mmax + 1):
        pos = idx[(m_complex == m)]
        m_size[m] = pos.shape[0]
        perm.extend(pos.tolist())
        if m > 0:
            neg = idx[(m_complex == -m)]
            perm.extend(neg.tolist())
    to_m_perm = np.asarray(perm, dtype=np.int32)
    from_m_perm = np.argsort(to_m_perm).astype(np.int32)

    rescale = np.ones((lmax + 1) ** 2, dtype=np.float64)
    if mmax < lmax:
        for l in range(mmax + 1, lmax + 1):
            rescale[l * l : l * l + 2 * l + 1] = np.sqrt(
                (2 * l + 1) / (2 * mmax + 1)
            )

    return IrrepsLayout(
        lmax=lmax,
        mmax=mmax,
        l_harmonic=l_harmonic,
        m_complex=m_complex,
        to_m_perm=to_m_perm,
        from_m_perm=from_m_perm,
        m_size=m_size,
        full_indices=full_indices,
        rescale=rescale,
    )
