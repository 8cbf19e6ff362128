"""Pallas TPU kernel: fused factored-Wigner edge-frame rotation.

``rotate_to_edge`` / ``rotate_from_edge`` (ops/rotation.py) apply
D = Xz(a) J Xz(b) J Xz(g) per edge.  The XLA path materializes the doubled
[E, 2K, C] stage operands in HBM (~1.2 ms/stage at E=5120, C=256 on v5e —
profiled as the #1 non-kernel cost: layout copies + stage fusions were ~25%
of device time in round 2).  This kernel runs the whole 5-factor chain per
edge-tile in VMEM: HBM traffic drops to one read of x and one write of y.

Algebra (flip-folded stages, see ops/rotation.py):
    z  = [c1 o x ; s1 o x]            (concat over the coefficient axis)
    h  = W1 z                         (W1 = [J | J P] etc., constant)
    z2 = [c2 o h ; s2 o h]
    uv = W2 z2                        (W2 stacks the last J stage AND its
                                       flip-permuted rows, so the final
                                       z-apply needs no gather)
    y  = t3a o uv[:Ko] + t3b o uv[Ko:]

Every direction/rescale variant differs ONLY in its tables, and the operator
is LINEAR in x, so differentiation is closed:
    (to_edge)^T            = from_edge without rescale
    (from_edge o R)^T      = to_edge with R folded into its first stage
Two mutually-recursive custom_vjps (like ops/pallas/segsum.gather_nodes)
give exact arbitrary-order AD with zero residual tensors.

Conventions follow ops/rotation.py (real SH, z-primary; reference
equivariant rotation: models/EquiformerV2Functions/so3.py:128-195).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU builds of pallas
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

__all__ = ["rotate_to_edge_fused", "rotate_from_edge_fused"]


def _interpret() -> bool:
    from ...utils.backend import on_tpu

    return not on_tpu()


def _block_spec(shape, index_map=None):
    kwargs = {}
    if _VMEM is not None:
        kwargs["memory_space"] = _VMEM
    return pl.BlockSpec(shape, index_map, **kwargs)


# ── kernel ────────────────────────────────────────────────────────────────


def _rot_kernel(
    t1a_ref, t1b_ref, t2a_ref, t2b_ref, t3a_ref, t3b_ref,
    w1_ref, w2_ref, x_ref, o_ref,
):
    x = x_ref[:]                      # [T, Ki, C]
    dt = x.dtype

    T, Ki, C = x.shape
    # K-minor compute layout: transpose once (f32 — Mosaic restricts 16-bit
    # minor relayouts), then every stage is ONE [T*C, K]-shaped MXU dot
    # instead of T tiny per-edge matmuls
    xt = jnp.transpose(x.astype(jnp.float32), (0, 2, 1))  # [T, C, Ki]
    xt = xt.astype(dt)

    def lane(t_ref):
        # [T, K] -> [T, 1, K]: sublane-dim insertion (minor dim unchanged)
        return t_ref[:][:, None, :].astype(dt)

    W1 = w1_ref[:].astype(dt)          # [Km, 2Ki]
    Km = W1.shape[0]
    W1a, W1b = W1[:, :Ki], W1[:, Ki:]
    z1 = (xt * lane(t1a_ref)).reshape(T * C, Ki)
    z2 = (xt * lane(t1b_ref)).reshape(T * C, Ki)
    h = (
        jax.lax.dot_general(
            z1, W1a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            z2, W1b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ).astype(dt).reshape(T, C, Km)
    W2 = w2_ref[:].astype(dt)          # [2Ko, 2Km]
    Ko = W2.shape[0] // 2
    W2a, W2b = W2[:, :Km], W2[:, Km:]
    y1 = (h * lane(t2a_ref)).reshape(T * C, Km)
    y2 = (h * lane(t2b_ref)).reshape(T * C, Km)
    uv = (
        jax.lax.dot_general(
            y1, W2a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            y2, W2b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ).astype(dt).reshape(T, C, 2 * Ko)
    y = uv[:, :, :Ko] * lane(t3a_ref) + uv[:, :, Ko:] * lane(t3b_ref)
    # back to [T, Ko, C] for the standard-layout output block
    yt = jnp.transpose(y.astype(jnp.float32), (0, 2, 1))
    o_ref[:] = yt.astype(o_ref.dtype)


def _tile(Ki: int, Km: int, Ko: int, C: int):
    """Edge tile / channel block.

    Mosaic requires each block's last two dims to be (8, 128)-divisible or
    equal to the full array dims.  The [K*, E]-shaped table blocks put the
    edge tile in the LAST dim, so T must be a multiple of 128; the channel
    block must be a multiple of 128 or all of C.  T=128, Cb<=128 keeps the
    working set ~10 MB in bf16 (fits the 16 MB scoped VMEM).
    """
    T = 128
    # full-C blocks: longer contiguous DMA runs; VMEM allows it (64 MB limit)
    Cb = C if (C % 128 == 0 and C <= 512) else (128 if C % 128 == 0 else C)
    return T, Cb


def _call_rot(x, tabs):
    """x: [E, Ki, C] (E already tile-aligned) -> [E, Ko, C]."""
    t1a, t1b, t2a, t2b, t3a, t3b, W1, W2 = tabs
    E, Ki, C = x.shape
    Km = t2a.shape[1]
    Ko = t3a.shape[1]
    T, Cb = _tile(Ki, Km, Ko, C)
    n_tiles = E // T
    n_cblk = C // Cb

    et_spec = _block_spec((T, Ki), lambda i, j: (i, 0))       # [E, Ki]
    km_spec = _block_spec((T, Km), lambda i, j: (i, 0))       # [E, Km]
    ko_spec = _block_spec((T, Ko), lambda i, j: (i, 0))       # [E, Ko]
    w1_spec = _block_spec(W1.shape, lambda i, j: (0, 0))
    w2_spec = _block_spec(W2.shape, lambda i, j: (0, 0))
    x_spec = _block_spec((T, Ki, Cb), lambda i, j: (i, 0, j))
    o_spec = _block_spec((T, Ko, Cb), lambda i, j: (i, 0, j))

    kwargs = {}
    if pltpu is not None and not _interpret():
        # the T=128 x Cb=128 working set slightly exceeds the default 16 MB
        # scoped-vmem limit (v5e has 128 MB physical VMEM)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"),
        )
    return pl.pallas_call(
        _rot_kernel,
        grid=(n_tiles, n_cblk),
        in_specs=[
            et_spec, et_spec, km_spec, km_spec, ko_spec, ko_spec,
            w1_spec, w2_spec, x_spec,
        ],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((E, Ko, C), x.dtype),
        interpret=_interpret(),
        **kwargs,
    )(t1a, t1b, t2a, t2b, t3a, t3b, W1, W2, x)


# ── mutually-recursive custom_vjp pair (linear operator) ──────────────────


def _zeros(tabs):
    return jax.tree_util.tree_map(jnp.zeros_like, tabs)


@jax.custom_vjp
def _to_core(x, tabs_self, tabs_adj):
    return _call_rot(x, tabs_self)


def _to_fwd(x, tabs_self, tabs_adj):
    return _to_core(x, tabs_self, tabs_adj), (tabs_self, tabs_adj)


def _to_bwd(res, g):
    tabs_self, tabs_adj = res
    return (
        _from_core(g, tabs_adj, tabs_self),
        _zeros(tabs_self),
        _zeros(tabs_adj),
    )


_to_core.defvjp(_to_fwd, _to_bwd)


@jax.custom_vjp
def _from_core(x, tabs_self, tabs_adj):
    return _call_rot(x, tabs_self)


def _from_fwd(x, tabs_self, tabs_adj):
    return _from_core(x, tabs_self, tabs_adj), (tabs_self, tabs_adj)


def _from_bwd(res, g):
    tabs_self, tabs_adj = res
    return (
        _to_core(g, tabs_adj, tabs_self),
        _zeros(tabs_self),
        _zeros(tabs_adj),
    )


_from_core.defvjp(_from_fwd, _from_bwd)


# ── table construction ────────────────────────────────────────────────────


@functools.lru_cache(maxsize=None)
def _consts(lmax: int, mmax: int):
    """Static per-(lmax, mmax) constants for both directions."""
    from ..irreps import layout as get_layout
    from ..rotation import (
        _J_dense,
        _abs_m_index,
        _flip_index,
        _flip_index_reduced,
        _sign_m,
    )

    lay = get_layout(lmax, mmax)
    J = _J_dense(lmax)
    flip = _flip_index(lmax)
    flip_r = _flip_index_reduced(lmax, mmax)
    absm_f = _abs_m_index(lmax)
    sign_f = _sign_m(lmax)
    absm_r = np.abs(lay.m_complex).astype(np.int32)
    sign_r = np.sign(lay.m_complex).astype(np.float32)
    if mmax < lmax:
        Jr = J[lay.full_indices, :]
        Jc = J[:, lay.full_indices]
    else:
        Jr, Jc = J, J
    # to_edge: W1 = [J | JP]; W2 = [[Jr | Jr P] ; P_r [Jr | Jr P]]
    W1_to = np.concatenate([J, J[:, flip]], axis=1)
    Jp_r = np.concatenate([Jr, Jr[:, flip]], axis=1)
    W2_to = np.concatenate([Jp_r, Jp_r[flip_r, :]], axis=0)
    # from_edge (inverse stages): W1 = [Jc | -Jc P_r]; W2 = [[J | -JP] ; P .]
    W1_from = np.concatenate([Jc, -Jc[:, flip_r]], axis=1)
    Jp_i = np.concatenate([J, -J[:, flip]], axis=1)
    W2_from = np.concatenate([Jp_i, Jp_i[flip, :]], axis=0)
    rescale = np.asarray(lay.rescale, dtype=np.float32)
    m0_rows = np.nonzero(np.asarray(lay.m_complex) == 0)[0].astype(np.int32)
    return dict(
        absm_f=absm_f, sign_f=sign_f, absm_r=absm_r, sign_r=sign_r,
        W1_to=W1_to.astype(np.float32), W2_to=W2_to.astype(np.float32),
        W1_from=W1_from.astype(np.float32),
        W2_from=W2_from.astype(np.float32), rescale=rescale,
        m0_rows=m0_rows, Kr=len(lay.m_complex),
    )


def _cs(cos_m, sin_m, absm, sign):
    """[E, K] cos / sin(m t) tables from [E, lmax+1] per-|m| tables."""
    c = cos_m[:, absm].astype(jnp.float32)
    s = (sin_m[:, absm] * jnp.asarray(sign)[None, :]).astype(jnp.float32)
    return c, s


def _tabs_to(w, k, rescale_in: bool):
    """to_edge tables; rescale_in folds the from-edge rescale into stage 1
    (the adjoint of the RESCALED from_edge)."""
    c_g, s_g = _cs(w.cg, w.sg, k["absm_f"], k["sign_f"])
    c_b, s_b = _cs(w.cb, w.sb, k["absm_f"], k["sign_f"])
    c_a, s_a = _cs(w.ca, w.sa, k["absm_r"], k["sign_r"])
    if rescale_in:
        r = jnp.asarray(k["rescale"])[None, :]
        c_g = c_g * r
        s_g = s_g * r
    return (
        c_g, s_g,                      # t1: [E, K]
        c_b, s_b,                      # t2: [E, K]
        c_a, -s_a,                     # t3: [E, Kr]
        jnp.asarray(k["W1_to"]), jnp.asarray(k["W2_to"]),
    )


def _tabs_from(w, k, rescale_out: bool):
    """from_edge tables; rescale_out applies the |m|-truncation rescale."""
    c_g, s_g = _cs(w.cg, w.sg, k["absm_f"], k["sign_f"])
    c_b, s_b = _cs(w.cb, w.sb, k["absm_f"], k["sign_f"])
    c_a, s_a = _cs(w.ca, w.sa, k["absm_r"], k["sign_r"])
    t3a, t3b = c_g, s_g                # [E, K]
    if rescale_out:
        r = jnp.asarray(k["rescale"])[None, :]
        t3a = t3a * r
        t3b = t3b * r
    return (
        c_a, s_a,                      # t1: [E, Kr]
        c_b, s_b,                      # t2: [E, K]
        t3a, t3b,                      # t3: [E, K]
        jnp.asarray(k["W1_from"]), jnp.asarray(k["W2_from"]),
    )


# E is padded to a multiple of this OUTSIDE the custom_vjp chain: a jnp.pad
# inside a custom_vjp primal corrupts residual binding under lax.scan +
# second-order AD (see ops/pallas/s2act.py:_call)
_MAX_TILE = 128


def _pad_tabs(tabs, E, pad):
    if pad == 0:
        return tabs
    out = []
    for t in tabs:
        if t.ndim == 2 and t.shape[0] == E:  # per-edge tables (constants
            t = jnp.pad(t, ((0, pad), (0, 0)))  # W1/W2 never match E)
        out.append(t)
    return tuple(out)


def _slice_m0(ts, ta, k):
    """Restrict a (to_edge, adjoint from_edge) table pair to the m = 0
    OUTPUT rows.

    In the GATA attention branch only the m = 0 block of the rotated message
    feeds live compute (the value activation rebuilds its stream from the
    unrotated X_j; reference Gotennet fork transformer_block.py:311-325), but
    the pallas rotate is opaque to XLA's dead-code elimination — slice the
    constants instead so the kernel computes (lmax+1)/K_red of the output.
    The flip permutation fixes m = 0 (so the P_r-permuted W2 block slices to
    the same rows), and cos(0)=1 / sin(0)=0 keep t3 trivially consistent.
    """
    m0 = k["m0_rows"]
    Kr = k["Kr"]
    t1a, t1b, t2a, t2b, t3a, t3b, W1, W2 = ts
    ts_m0 = (
        t1a, t1b, t2a, t2b,
        t3a[:, m0], t3b[:, m0],
        W1, W2[np.concatenate([m0, Kr + m0]), :],
    )
    a1a, a1b, a2a, a2b, a3a, a3b, V1, V2 = ta
    ta_m0 = (
        a1a[:, m0], a1b[:, m0], a2a, a2b, a3a, a3b,
        V1[:, np.concatenate([m0, Kr + m0])], V2,
    )
    return ts_m0, ta_m0


def rotate_to_edge_m0_fused(w, x, layout):
    """Fused rotate_to_edge producing ONLY the m = 0 rows:
    [E, K_full, C] -> [E, lmax+1, C] (order l = 0..lmax)."""
    k = _consts(layout.lmax, layout.mmax)
    ts, ta = _slice_m0(
        _tabs_to(w, k, rescale_in=False),
        _tabs_from(w, k, rescale_out=False),
        k,
    )
    E = x.shape[0]
    pad = (-E) % _MAX_TILE
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        ts = _pad_tabs(ts, E, pad)
        ta = _pad_tabs(ta, E, pad)
    out = _to_core(x, ts, ta)
    return out[:E] if pad else out


def rotate_to_edge_fused(w, x, layout):
    """Drop-in fused rotate_to_edge: [E, K_full, C] -> [E, K_red, C]."""
    k = _consts(layout.lmax, layout.mmax)
    ts = _tabs_to(w, k, rescale_in=False)
    ta = _tabs_from(w, k, rescale_out=False)
    E = x.shape[0]
    pad = (-E) % _MAX_TILE
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        ts = _pad_tabs(ts, E, pad)
        ta = _pad_tabs(ta, E, pad)
    out = _to_core(x, ts, ta)
    return out[:E] if pad else out


def rotate_from_edge_fused(w, x, layout):
    """Drop-in fused rotate_from_edge: [E, K_red, C] -> [E, K_full, C]."""
    k = _consts(layout.lmax, layout.mmax)
    ts = _tabs_from(w, k, rescale_out=True)
    ta = _tabs_to(w, k, rescale_in=True)
    E = x.shape[0]
    pad = (-E) % _MAX_TILE
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        ts = _pad_tabs(ts, E, pad)
        ta = _pad_tabs(ta, E, pad)
    out = _from_core(x, ts, ta)
    return out[:E] if pad else out
