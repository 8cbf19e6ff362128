"""Per-edge rotations: frame construction, Euler angles, runtime Wigner-D.

TPU-native counterpart of the reference ``SO3_Rotation`` /
``RotationToWignerDMatrix`` / ``init_edge_rot_mat`` machinery
(reference models/EquiformerV2Functions/so3.py:482-545, edge_rot_mat.py:13-80,
models/equiformerv2_MatPES_GATAV2.py:54-69).

Differences by design:
* We align each edge with the **z axis** (the natural azimuthal axis of the
  real-SH basis in ops/sph.py), not y — the SO(2) structure is identical.
* The frame is the *deterministic* cardinal-axis construction the GATA models
  use (reference equiformerv2_MatPES_GATAV2.py:54-69), not the random-vector
  baseline (reference edge_rot_mat.py:28-58) — deterministic is jit-friendly
  and reproducible.
* Wigner-D is built as ``Xz(a) @ J @ Xz(b) @ J @ Xz(g)`` with J matrices we
  generate ourselves (ops/wigner_np.py) instead of loading e3nn's missing
  ``Jd.pt`` (reference wigner.py:9).
* Wigner blocks are kept **per degree** (list of [E, 2l+1, 2l+1]) rather than
  as one dense [E, K, K] block-diagonal — rotating per degree skips the
  guaranteed-zero off-blocks (4x fewer FLOPs at lmax=4) and maps onto batched
  matmuls XLA tiles well.

All geometry here is wrapped in ``stop_gradient`` — matching the reference's
``.detach()`` of frames and Wigner matrices: gradients flow through distances
and through the re-computed displacement vectors, never through the frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .irreps import IrrepsLayout
from .wigner_np import J_matrices

__all__ = [
    "edge_frame",
    "frame_to_zyz_angles",
    "WignerBlocks",
    "WignerFactors",
    "compute_wigner",
    "compute_wigner_blocks",
    "rotate_to_edge",
    "rotate_from_edge",
]


def edge_frame(edge_vec):
    """Deterministic orthonormal frame per edge: rows (a, b, v_hat).

    ``R @ v_hat = z_hat``.  The in-plane axes are built from the cardinal axis
    least aligned with the edge (reference equiformerv2_MatPES_GATAV2.py:54-69),
    so the frame is a deterministic, locally-smooth function of the direction.

    Args:
        edge_vec: [E, 3] displacement vectors (need not be normalized).
    Returns:
        [E, 3, 3] rotation matrices (det +1), gradient-stopped.
    """
    v = jax.lax.stop_gradient(edge_vec)
    dist = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    vhat = v / jnp.maximum(dist, 1e-8)

    best = jnp.argmin(jnp.abs(vhat), axis=-1)
    ref = jnp.eye(3, dtype=vhat.dtype)[best]

    b = jnp.cross(vhat, ref)
    b = b / jnp.maximum(
        jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True)), 1e-8
    )
    a = jnp.cross(b, vhat)
    return jnp.stack([a, b, vhat], axis=-2)


def frame_to_zyz_angles(rot):
    """ZYZ Euler angles of ``R`` with ``R = Rz(alpha) Ry(beta) Rz(gamma)``.

    Robust at the poles: (phi, theta) come from the image of z under
    ``R^T`` (the third row of R read as a direction), and gamma from the exact
    residual z-rotation — no atan2(0, 0) degeneracies for edges along z.

    Returns (alpha, beta, gamma), each [E].
    """
    rot = jax.lax.stop_gradient(rot)
    # R^{-1} = R^T maps z_hat to v_hat = third row of R.
    v = rot[..., 2, :]
    # arctan2 form is well conditioned at the poles (arccos is not, in fp32)
    theta = jnp.arctan2(
        jnp.sqrt(v[..., 0] ** 2 + v[..., 1] ** 2), v[..., 2]
    )
    phi = jnp.arctan2(v[..., 1], v[..., 0])

    # Residual: Rz(g0) = Ry(-theta) Rz(-phi) R^T  (exactly a z-rotation).
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    zeros = jnp.zeros_like(ct)
    ones = jnp.ones_like(ct)
    ry = jnp.stack(
        [
            jnp.stack([ct, zeros, -st], -1),
            jnp.stack([zeros, ones, zeros], -1),
            jnp.stack([st, zeros, ct], -1),
        ],
        -2,
    )
    rz = jnp.stack(
        [
            jnp.stack([cp, sp, zeros], -1),
            jnp.stack([-sp, cp, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        -2,
    )
    # HIGHEST: full-f32 matmuls — TPU default (bf16 inputs) costs ~4e-4 angle
    # error, which leaks into every Wigner matrix.  These are 3x3s; free.
    hp = jax.lax.Precision.HIGHEST
    m = jnp.einsum(
        "...ij,...jk,...lk->...il", ry, rz, rot, precision=hp
    )
    g0 = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])

    # R^T = Rz(phi) Ry(theta) Rz(g0)  =>  R = Rz(-g0) Ry(-theta) Rz(-phi)
    return -g0, -theta, -phi


def _z_rot(l: int, angle):
    """Real-basis Wigner-D of Rz(angle) for degree l: [..., 2l+1, 2l+1]."""
    m = jnp.arange(-l, l + 1, dtype=angle.dtype)
    c = jnp.cos(m * angle[..., None])
    s = jnp.sin(m * angle[..., None])
    eye = jnp.eye(2 * l + 1, dtype=angle.dtype)
    anti = eye[::-1]  # 1 at [i, 2l - i]
    # center cell (m=0) gets cos(0) + (-sin(0)) = 1: correct.
    return c[..., :, None] * eye + (-s)[..., :, None] * anti


class WignerBlocks:
    """Per-degree Wigner-D blocks for a batch of edges (gradient-stopped).

    Registered as a jax pytree so it can flow through jit/remat/scan.
    """

    def __init__(self, blocks):
        self.blocks = list(blocks)  # list over l of [E, 2l+1, 2l+1]

    @property
    def lmax(self) -> int:
        return len(self.blocks) - 1


jax.tree_util.register_pytree_node(
    WignerBlocks,
    lambda w: (tuple(w.blocks), None),
    lambda aux, children: WignerBlocks(children),
)


def compute_wigner_blocks(lmax: int, edge_vec, dtype=jnp.float32) -> WignerBlocks:
    """Wigner-D blocks of the edge-alignment rotation for each edge."""
    rot = edge_frame(edge_vec.astype(jnp.float32))
    alpha, beta, gamma = frame_to_zyz_angles(rot)
    Js = J_matrices(lmax)
    blocks = []
    for l in range(lmax + 1):
        if l == 0:
            blocks.append(
                jnp.ones(alpha.shape + (1, 1), dtype=dtype)
            )
            continue
        J = jnp.asarray(Js[l], dtype=jnp.float32)
        xa = _z_rot(l, alpha)
        xb = _z_rot(l, beta)
        xc = _z_rot(l, gamma)
        hp = jax.lax.Precision.HIGHEST
        Jxc = jnp.einsum("ij,ejk->eik", J, xc, precision=hp)
        xbJxc = jnp.einsum("eij,ejk->eik", xb, Jxc, precision=hp)
        JxbJxc = jnp.einsum("ij,ejk->eik", J, xbJxc, precision=hp)
        D = jnp.einsum("eij,ejk->eik", xa, JxbJxc, precision=hp)
        blocks.append(jax.lax.stop_gradient(D).astype(dtype))
    return WignerBlocks(blocks)


def _m_keep_rows(l: int, mmax: int) -> np.ndarray:
    """Row indices within a degree-l block for |m| <= mmax."""
    mm = min(l, mmax)
    return np.arange(l - mm, l + mm + 1)


# ════════════════════════════════════════════════════════════════════════════
# Factored Wigner application — the TPU-native fast path.
#
# D = Xz(a) @ J @ Xz(b) @ J @ Xz(g): each Xz is a per-edge *elementwise*
# butterfly over (m, -m) pairs (VPU; fused by XLA), and J is a CONSTANT
# block-diagonal matrix shared by all edges, so applying it is one big
# [K, K] x [K, E*C] GEMM with full MXU utilization — instead of the
# per-edge batched [d, d] x [d, C] matmuls of the block path, which pad each
# tiny matrix onto the 128x128 systolic array (~1% utilization; SURVEY ranks
# that bmm the #1 hot loop of the reference).
# ════════════════════════════════════════════════════════════════════════════

import functools


@functools.lru_cache(maxsize=None)
def _flip_index(lmax: int) -> np.ndarray:
    """index of the (l, -m) coefficient for each (l, m) in l-primary layout."""
    idx = np.zeros((lmax + 1) ** 2, dtype=np.int32)
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            idx[l * l + l + m] = l * l + l - m
    return idx


@functools.lru_cache(maxsize=None)
def _flip_index_reduced(lmax: int, mmax: int) -> np.ndarray:
    from .irreps import layout as get_layout

    lay = get_layout(lmax, mmax)
    # position of (l, -m) within the reduced layout
    pos_of = {}
    for i, (l, m) in enumerate(zip(lay.l_harmonic, lay.m_complex)):
        pos_of[(int(l), int(m))] = i
    return np.asarray(
        [
            pos_of[(int(l), -int(m))]
            for l, m in zip(lay.l_harmonic, lay.m_complex)
        ],
        dtype=np.int32,
    )


@functools.lru_cache(maxsize=None)
def _abs_m_index(lmax: int) -> np.ndarray:
    return np.concatenate(
        [np.abs(np.arange(-l, l + 1)) for l in range(lmax + 1)]
    ).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _sign_m(lmax: int) -> np.ndarray:
    return np.concatenate(
        [np.sign(np.arange(-l, l + 1)) for l in range(lmax + 1)]
    ).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _J_dense(lmax: int) -> np.ndarray:
    """Block-diagonal J over the full (lmax+1)^2 coefficient axis."""
    K = (lmax + 1) ** 2
    J = np.zeros((K, K), dtype=np.float32)
    for l, Jl in enumerate(J_matrices(lmax)):
        J[l * l : l * l + 2 * l + 1, l * l : l * l + 2 * l + 1] = Jl
    return J


class WignerFactors:
    """Per-edge cos/sin tables for the factored Wigner application.

    cos_*/sin_* have shape [E, lmax+1] (per |m|); expansion to the
    coefficient axis happens via static gathers at apply time.
    """

    def __init__(self, lmax, ca, sa, cb, sb, cg, sg):
        self.lmax = lmax
        self.ca, self.sa = ca, sa
        self.cb, self.sb = cb, sb
        self.cg, self.sg = cg, sg


jax.tree_util.register_pytree_node(
    WignerFactors,
    lambda w: ((w.ca, w.sa, w.cb, w.sb, w.cg, w.sg), w.lmax),
    lambda lmax, c: WignerFactors(lmax, *c),
)


def compute_wigner(lmax: int, edge_vec, dtype=jnp.float32) -> WignerFactors:
    """Factored per-edge Wigner rotation (gradient-stopped geometry)."""
    rot = edge_frame(edge_vec.astype(jnp.float32))
    alpha, beta, gamma = frame_to_zyz_angles(rot)
    m = jnp.arange(0, lmax + 1, dtype=jnp.float32)

    def cs(angle):
        t = m * angle[:, None]
        return jnp.cos(t).astype(dtype), jnp.sin(t).astype(dtype)

    ca, sa = cs(alpha)
    cb, sb = cs(beta)
    cg, sg = cs(gamma)
    return WignerFactors(
        lmax,
        *map(jax.lax.stop_gradient, (ca, sa, cb, sb, cg, sg)),
    )


def _apply_z_full(x, cos_m, sin_m, lmax: int, inverse: bool = False):
    """y[m] = cos(m t) x[m] - sin(m t) x[-m] on the full layout."""
    absm = _abs_m_index(lmax)
    sign = jnp.asarray(_sign_m(lmax), dtype=x.dtype)
    flip = _flip_index(lmax)
    cos_m = cos_m.astype(x.dtype)
    sin_m = sin_m.astype(x.dtype)
    c = cos_m[:, absm]                       # [E, K]
    s = sin_m[:, absm] * sign[None, :]       # [E, K] = sin(m t)
    if inverse:
        s = -s
    return c[..., None] * x - s[..., None] * x[:, flip, :]


def _apply_z_reduced(x, cos_m, sin_m, layout: IrrepsLayout, inverse: bool = False):
    absm = np.abs(layout.m_complex)
    sign = jnp.asarray(
        np.sign(layout.m_complex).astype(np.float32), dtype=x.dtype
    )
    flip = _flip_index_reduced(layout.lmax, layout.mmax)
    cos_m = cos_m.astype(x.dtype)
    sin_m = sin_m.astype(x.dtype)
    c = cos_m[:, absm]
    s = sin_m[:, absm] * sign[None, :]
    if inverse:
        s = -s
    return c[..., None] * x - s[..., None] * x[:, flip, :]


# ── flip-folded K-major pipeline ─────────────────────────────────────────────
#
# Each (z-apply, J) pair is ONE constant GEMM: with P the (m -> -m) flip
# permutation, S = diag(sin(m t)), C = diag(cos(m t)),
#     J (C - S P) x = J (c o x) + (J P) (s o x)          (since S P = P (-S'))
# so stacking [c o x ; s o x] and multiplying by [J | JP] ([K, 2K], constant)
# absorbs the flip-gather and both elementwise products into the GEMM's
# operand fusion.  The whole pipeline runs K-MAJOR ([K, E, C]): the natural
# output layout of dot(J, x[K, E*C]) is exactly [K, E, C], so XLA emits NO
# transpose copies between stages — profiled r2, plain [E,K,C] einsums spent
# ~25% of device time in layout copies (`scripts/tpu_profile.py`).
# FLOP cost is identical on the MXU: the contraction dim (2K=50) still pads
# to the same 128-wide systolic tile as K=25.


@functools.lru_cache(maxsize=None)
def _J_pair(lmax: int, mmax: int | None = None) -> np.ndarray:
    """[J | J[:, flip]] with rows reduced to |m| <= mmax when given."""
    from .irreps import layout as get_layout

    J = _J_dense(lmax)
    flip = _flip_index(lmax)
    if mmax is not None and mmax < lmax:
        J = J[get_layout(lmax, mmax).full_indices, :]
    return np.concatenate([J, J[:, flip]], axis=1)


@functools.lru_cache(maxsize=None)
def _Jc_pair_reduced(lmax: int, mmax: int) -> np.ndarray:
    """[Jc | Jc[:, flip_red]]: J columns reduced to the |m| <= mmax layout."""
    from .irreps import layout as get_layout

    J = _J_dense(lmax)
    if mmax < lmax:
        Jc = J[:, get_layout(lmax, mmax).full_indices]
    else:
        Jc = J
    flip_r = _flip_index_reduced(lmax, mmax)
    return np.concatenate([Jc, Jc[:, flip_r]], axis=1)


def _tables_km(cos_m, sin_m, absm, sign, dtype):
    """K-major per-coefficient tables: c, s with shape [K, E]."""
    c = cos_m.T[absm].astype(dtype)
    s = (sin_m.T[absm] * np.asarray(sign)[:, None]).astype(dtype)
    return c, s


def _stage_km(Jpair, c, s, x, sign: float = 1.0):
    """One (z-apply o J) stage, K-major: [K_out, E, C] from [K_in, E, C]."""
    z = jnp.concatenate([c[..., None] * x, (sign * s)[..., None] * x], axis=0)
    return jnp.einsum(
        "ik,kec->iec", jnp.asarray(Jpair, dtype=x.dtype), z
    )


def _rotate_to_edge_factored(w: WignerFactors, x, layout: IrrepsLayout):
    lmax = layout.lmax
    absm_f = _abs_m_index(lmax)
    sign_f = _sign_m(lmax)
    xT = jnp.transpose(x, (1, 0, 2))  # [K, E, C]
    c_g, s_g = _tables_km(w.cg, w.sg, absm_f, sign_f, x.dtype)
    z = _stage_km(_J_pair(lmax), c_g, s_g, xT)
    c_b, s_b = _tables_km(w.cb, w.sb, absm_f, sign_f, x.dtype)
    z = _stage_km(_J_pair(lmax, layout.mmax), c_b, s_b, z)
    # final z-apply(alpha) on the reduced layout, still K-major
    absm_r = np.abs(layout.m_complex)
    sign_r = np.sign(layout.m_complex).astype(np.float32)
    flip_r = _flip_index_reduced(lmax, layout.mmax)
    c_a, s_a = _tables_km(w.ca, w.sa, absm_r, sign_r, x.dtype)
    z = c_a[..., None] * z - s_a[..., None] * z[flip_r]
    return jnp.transpose(z, (1, 0, 2))


def _rotate_from_edge_factored(w: WignerFactors, x, layout: IrrepsLayout):
    lmax = layout.lmax
    absm_r = np.abs(layout.m_complex)
    sign_r = np.sign(layout.m_complex).astype(np.float32)
    xT = jnp.transpose(x, (1, 0, 2))  # [K_red, E, C]
    # inverse stages: J (c o x) - (JP) (s o x)
    c_a, s_a = _tables_km(w.ca, w.sa, absm_r, sign_r, x.dtype)
    z = _stage_km(
        _Jc_pair_reduced(lmax, layout.mmax), c_a, s_a, xT, sign=-1.0
    )
    absm_f = _abs_m_index(lmax)
    sign_f = _sign_m(lmax)
    c_b, s_b = _tables_km(w.cb, w.sb, absm_f, sign_f, x.dtype)
    z = _stage_km(_J_pair(lmax), c_b, s_b, z, sign=-1.0)
    # final inverse z-apply(gamma): c o x + s o x[flip]
    flip_f = _flip_index(lmax)
    c_g, s_g = _tables_km(w.cg, w.sg, absm_f, sign_f, x.dtype)
    z = c_g[..., None] * z + s_g[..., None] * z[flip_f]
    if layout.mmax < lmax:
        z = z * jnp.asarray(layout.rescale, dtype=z.dtype)[:, None, None]
    return jnp.transpose(z, (1, 0, 2))


def _use_fused_rotate() -> bool:
    """Fused pallas rotate (ops/pallas/rotate.py): default on TPU;
    flags fused_rotate='on'/'off' overrides ('on' runs interpret mode
    off-TPU — test use).  utils/flags.py, never os.environ at trace time."""
    from ..utils import flags as _flags

    v = _flags.current().fused_rotate
    if v != "auto":
        return v == "on"
    from ..utils.backend import on_tpu

    return on_tpu()


def rotate_to_edge(wigner, x, layout: IrrepsLayout):
    """Rotate node features into each edge frame, truncating to |m| <= mmax.

    Args:
        wigner: WignerFactors (fast factored path) or WignerBlocks.
        x: [E, (lmax+1)**2, C] features in the global frame (l-primary).
        layout: target layout with the mmax truncation.
    Returns:
        [E, K_red, C] features in the edge frame (l-primary reduced layout).
    """
    if isinstance(wigner, WignerFactors):
        if _use_fused_rotate():
            from .pallas.rotate import rotate_to_edge_fused

            return rotate_to_edge_fused(wigner, x, layout)
        return _rotate_to_edge_factored(wigner, x, layout)
    from .pallas.rotate_dense import WignerDense, rotate_to_edge_dense

    if isinstance(wigner, WignerDense):
        assert layout.mmax == wigner.mmax
        return rotate_to_edge_dense(wigner, x, layout)
    out = []
    for l in range(layout.lmax + 1):
        w = wigner.blocks[l]
        xl = x[:, l * l : l * l + 2 * l + 1, :]
        if layout.mmax < l:
            w = w[:, _m_keep_rows(l, layout.mmax), :]
        out.append(jnp.einsum("eij,ejc->eic", w, xl))
    return jnp.concatenate(out, axis=1)


def rotate_to_edge_m0(wigner, x, layout: IrrepsLayout):
    """rotate_to_edge returning ONLY the m = 0 rows: [E, lmax+1, C].

    For value paths that consume just the invariant (m = 0) block of the
    rotated message (the GATA attention branch) — the fused kernel computes
    (lmax+1)/K_red of the output; the XLA paths rely on DCE of the slice.
    """
    if isinstance(wigner, WignerFactors) and _use_fused_rotate():
        from .pallas.rotate import rotate_to_edge_m0_fused

        return rotate_to_edge_m0_fused(wigner, x, layout)
    from .pallas.rotate_dense import WignerDense, rotate_to_edge_m0_dense

    if isinstance(wigner, WignerDense):
        assert layout.mmax == wigner.mmax
        return rotate_to_edge_m0_dense(wigner, x, layout)
    m0_rows = np.nonzero(np.asarray(layout.m_complex) == 0)[0]
    return rotate_to_edge(wigner, x, layout)[:, m0_rows, :]


def rotate_from_edge(wigner: WignerBlocks, x, layout: IrrepsLayout):
    """Inverse rotation back to the global frame, zero-padding the truncated m.

    Applies the sqrt((2l+1)/(2*mmax+1)) rescale on truncated degrees
    (reference so3.py:175-195, 516-521).

    Args:
        x: [E, K_red, C] edge-frame features.
    Returns:
        [E, (lmax+1)**2, C] global-frame features.
    """
    if isinstance(wigner, WignerFactors):
        if _use_fused_rotate():
            from .pallas.rotate import rotate_from_edge_fused

            return rotate_from_edge_fused(wigner, x, layout)
        return _rotate_from_edge_factored(wigner, x, layout)
    from .pallas.rotate_dense import WignerDense, rotate_from_edge_dense

    if isinstance(wigner, WignerDense):
        assert layout.mmax == wigner.mmax
        return rotate_from_edge_dense(wigner, x, layout)
    out = []
    offset = 0
    for l in range(layout.lmax + 1):
        mm = min(l, layout.mmax)
        width = 2 * mm + 1
        xl = x[:, offset : offset + width, :]
        offset += width
        w = wigner.blocks[l]
        winv = jnp.swapaxes(w, -1, -2)
        if layout.mmax < l:
            winv = winv[:, :, _m_keep_rows(l, layout.mmax)]
            winv = winv * float(layout.rescale[l * l])
        out.append(jnp.einsum("eij,ejc->eic", winv, xl))
    return jnp.concatenate(out, axis=1)
