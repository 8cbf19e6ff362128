"""Fused (dense-Wigner rotate) x (SO(2) convolution) Pallas TPU kernels.

Round-2 profiling (PERF.md "what's left") showed ~13% of flagship device time
in layout copies at the pallas custom-call boundaries between the dense-Wigner
pairs rotate (ops/pallas/rotate_dense.py) and the SO(2)-conv GEMMs
(nn/so3_layers.py:SO2Conv), plus the HBM round-trips of the rotated
intermediates.  This module fuses the whole edge-message linear pipeline into
ONE kernel per direction, keeping the rotated features VMEM-resident:

  direction "in"  (attention conv-1; reference so2_ops.py:64-134 applied to a
                   message rotated by so3.py:128-195):
      x [E, K_full, c_rot] --pairs rotate--> u [rows, c_rot] (VMEM)
        --radial modulation--> t --per-m GEMMs (MXU, real/imag butterfly
        folded into one matmul)--> msg [E, K_red, c_msg] (+ extra m=0 block)

  direction "out" (attention conv-2 -> rotate-back; reference
                   transformer_block.py:307-336 + so3.py:175-195):
      msg [E, K_red, c_msg] (+ extra) --per-m GEMMs--> t rows (VMEM)
        --radial--> u --pairs rotate (truncation rescale folded into the
        pair values)--> y [E, K_full, c_rot]

The two directions are exact mutual adjoints on the linear-in-x part
(same scheme as rotate_dense.py): the custom_vjp of "in" computes dx with ONE
fused "out" call on the transposed weights and swapped pair values, and vice
versa — so the backward pass (which dominates force training: grad-of-grad)
runs through the same fused kernels.  Weight / radial / bias cotangents are
standard XLA contractions over recomputed VPU-cheap intermediates; every op in
the backward is differentiable, so arbitrary-order AD works (validated under
lax.scan + grad-of-grad in tests/test_rc_fused.py).

Geometry (the Wigner pair values) is gradient-stopped, matching the
reference's ``.detach()`` of frames (edge_rot_mat.py:13-80).

Shape requirements for the fused path (checked by ``rc_fusable``):
``c_rot % 128 == 0`` and ``c_msg % 128 == 0`` (lane-aligned row slicing) and
the edge axis padded to a 128 multiple (done by the public wrappers, OUTSIDE
the custom_vjp — a pad inside a custom_vjp primal corrupts residual binding
under scan + 2nd-order AD, see ops/pallas/s2act.py).  All reference model
configs satisfy the channel alignment (128/256-wide everywhere).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .rotate_dense import (
    WignerDense,
    _PairsAux,
    _apply_core,
    _block_spec,
    _interpret,
    _pair_info,
)

try:  # TPU-only module; absent on CPU builds of pallas
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

__all__ = [
    "RCMeta",
    "rc_fusable",
    "fused_rotate_conv",
    "fused_conv_rotate",
]

_TILE = 128


# ── static row / group tables ──────────────────────────────────────────────


@functools.lru_cache(maxsize=None)
def _rc_info(lmax: int, mmax: int):
    """Static m-block row lists and radial-group maps for one layout.

    ``m_rows[m]``: l-primary-reduced row indices feeding the order-m GEMM, in
    the exact order the unfused SO2Conv flattens them (m = 0: degrees
    ascending; m > 0: the +m ("real") rows then the -m ("imag") rows) — the
    weights are SHARED with the unfused path, so the order is load-bearing.
    ``rad_group``: [K_red] radial-modulation group of each reduced row (one
    group per distinct (l, |m|); real/imag rows share a group — reference
    so2_ops.py:117-131).
    """
    from ..irreps import layout as get_layout

    lay = get_layout(lmax, mmax)
    perm = np.asarray(lay.to_m_perm)
    L0 = int(lay.m_size[0])
    m_rows = [perm[0:L0].copy()]
    off = L0
    for m in range(1, mmax + 1):
        Lm = int(lay.m_size[m])
        m_rows.append(perm[off : off + 2 * Lm].copy())
        off += 2 * Lm
    K_red = int(perm.shape[0])

    rad_group = np.zeros(K_red, np.int32)
    for k in range(L0):
        rad_group[perm[k]] = k
    g = L0
    off = L0
    for m in range(1, mmax + 1):
        Lm = int(lay.m_size[m])
        for j in range(Lm):
            rad_group[perm[off + j]] = g + j
            rad_group[perm[off + Lm + j]] = g + j
        g += Lm
        off += 2 * Lm
    n_groups = g

    # rows in m-primary concat order (= perm) and its inverse, for the
    # backward's dt reassembly
    inv_perm = np.argsort(perm).astype(np.int32)
    group_onehot = np.zeros((K_red, n_groups), np.float32)
    for r in range(K_red):
        group_onehot[r, rad_group[r]] = 1.0
    return dict(
        m_rows=[np.asarray(r, np.int32) for r in m_rows],
        rad_group=rad_group,
        n_groups=n_groups,
        perm=perm.astype(np.int32),
        inv_perm=inv_perm,
        group_onehot=group_onehot,
        L0=L0,
        K_red=K_red,
        K_full=(lmax + 1) ** 2,
    )


@dataclasses.dataclass(frozen=True)
class RCMeta:
    """Hashable static descriptor of one fused rotate-conv application."""

    lmax: int
    mmax: int
    c_rot: int       # per-coefficient channels on the rotated (full) side
    c_msg: int       # per-coefficient channels on the msg (reduced) side
    extra: int       # extra m=0 invariant channels (output of "in")
    has_rad: bool
    has_bias: bool
    direction: str   # "in" | "out"
    m0: bool         # m0-restricted (GATA conv-1 value path)
    pair_kind: str   # "to" | "from" | "to_m0" | "from_m0"

    def adjoint(self) -> "RCMeta":
        flip = {"to": "from", "from": "to",
                "to_m0": "from_m0", "from_m0": "to_m0"}
        return dataclasses.replace(
            self,
            direction="out" if self.direction == "in" else "in",
            pair_kind=flip[self.pair_kind],
            has_bias=False,
        )

    def info(self):
        return _rc_info(self.lmax, self.mmax)

    def pairs(self):
        """(pairs, n_pair_out) for the rotate stage of this direction."""
        info = _pair_info(self.lmax, self.mmax)
        return {
            "to": (info["pairs_to"], info["K_red"]),
            "from": (info["pairs_from"], info["K_full"]),
            "to_m0": (info["pairs_to_m0"], info["n_m0"]),
            "from_m0": (info["pairs_from_m0"], info["K_full"]),
        }[self.pair_kind]

    def m_rows(self):
        """Row lists per m on the REDUCED side (rank order for m0 kinds)."""
        if self.m0:
            return [np.arange(self.info()["L0"], dtype=np.int32)]
        return self.info()["m_rows"]

    def rad_group_rows(self):
        if self.m0:
            return np.arange(self.info()["L0"], dtype=np.int32)
        return self.info()["rad_group"]

    def n_rows(self) -> int:
        return self.info()["L0"] if self.m0 else self.info()["K_red"]


def rc_fusable(meta: RCMeta) -> bool:
    """Channel alignment required for lane-aligned in-kernel row slicing."""
    return meta.c_rot % 128 == 0 and meta.c_msg % 128 == 0


def rc_enabled(site: str = "") -> bool:
    """Use the fused rotate-conv path whenever the Wigner representation is
    dense (ETQ_WIGNER=dense — the TPU default) and the channel widths align.

    ETQ_RC_FUSED: "1"/"" = all sites, "0" = none, or a comma list of sites
    ("conv1", "conv2") to fuse selectively (A/B profiling).

    Default OFF pending a kernel redesign: round-3 measurement showed the
    fused path REGRESSES flagship training 43.0 -> 36.0 g/s — the
    mutual-adjoint custom_vjp multiplies kernel invocations under
    grad-of-grad (~156 so2_conv custom calls/step profiled) and defeats
    XLA's cross-expression CSE/fusion of the unfused GEMMs (PERF.md round 3).
    """
    import os

    v = os.environ.get("ETQ_RC_FUSED", "")
    if v in ("0", "false", "off"):
        return False
    if v in ("1", "on", "all"):
        return True
    if v == "":
        return False
    return site in {s.strip() for s in v.split(",")}


def so2conv_fusable(wigner, c_in: int, c_out: int, extra: int = 0,
                    m0: bool = False, site: str = "") -> bool:
    """Whether an SO2Conv call can take the fused rotate+conv path: dense
    Wigner representation, fusion enabled, and lane-aligned channel widths
    (128-multiples for in-kernel row slicing).  All reference model configs
    satisfy the alignment (sphere 128, hidden 128, heads*value 128)."""
    from .rotate_dense import WignerDense

    if not isinstance(wigner, WignerDense) or not rc_enabled(site):
        return False
    if m0:
        # m0 path emits only the invariant `extra` block
        return extra > 0 and c_in % 128 == 0 and extra % 128 == 0
    return c_in % 128 == 0 and c_out % 128 == 0 and extra % 128 == 0


# ── kernel body ────────────────────────────────────────────────────────────


def _pairs_to_rows(v, x_ref_rows, pairs, n_out):
    """Static-unrolled pairs apply: list of [T, C] f32 accumulators.

    ``x_ref_rows(ki)`` returns the ki-th input row as [T, C]; pairs must be
    sorted by input row so each row is materialized once.
    """
    acc = [None] * n_out
    p, P = 0, pairs.shape[0]
    while p < P:
        ki = int(pairs[p, 1])
        xk = x_ref_rows(ki)
        while p < P and int(pairs[p, 1]) == ki:
            ko = int(pairs[p, 0])
            term = v[:, p][:, None] * xk
            acc[ko] = term if acc[ko] is None else acc[ko] + term
            p += 1
    return acc


def _rc_kernel_in(v_ref, x_ref, *refs, meta: RCMeta, pairs, w_shapes):
    """x --pairs--> u --rad--> t --GEMMs--> (msg, extra)."""
    idx = 0
    rad_ref = None
    if meta.has_rad:
        rad_ref = refs[idx]
        idx += 1
    n_w = len(w_shapes)
    w_refs = refs[idx : idx + n_w]
    idx += n_w
    n_b = 0
    if meta.has_bias:
        n_b = (1 if meta.extra else 0) + (0 if meta.m0 else 1)
    b_refs = refs[idx : idx + n_b]
    idx += n_b
    out_refs = refs[idx:]

    cdt = x_ref.dtype
    v = v_ref[:].astype(jnp.float32)                     # [T, P]
    x = x_ref[:]
    u = _pairs_to_rows(
        v, lambda ki: x[:, ki, :].astype(jnp.float32), pairs, meta.n_rows()
    )
    groups = meta.rad_group_rows()
    ca = meta.c_rot
    if rad_ref is not None:
        rad = rad_ref[:].astype(jnp.float32)             # [T, G*ca]
        for r in range(meta.n_rows()):
            g = int(groups[r])
            u[r] = u[r] * rad[:, g * ca : (g + 1) * ca]
    rows = [uu.astype(cdt) for uu in u]

    def rowdot(rs, w):
        # Mosaic rejects lane-axis concats of row slices; the equivalent
        # sum of per-row [T, ca] x [ca, out] dots (sublane-sliced weight)
        # compiles and keeps every dot a full-width MXU contraction.
        acc = None
        for j, r in enumerate(rs):
            d = jnp.dot(
                rows[int(r)], w[j * ca : (j + 1) * ca, :],
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        return acc

    m_rows = meta.m_rows()
    out_rows = [None] * meta.n_rows()
    wi = 0
    # m = 0 block
    if meta.extra:
        w_ex = w_refs[wi][:]
        wi += 1
        ex = rowdot(m_rows[0], w_ex).astype(cdt)
        if meta.has_bias:
            ex = ex + b_refs[0][0, :].astype(cdt)
    if not meta.m0:
        w0 = w_refs[wi][:]
        wi += 1
        y0 = rowdot(m_rows[0], w0).astype(cdt)
        if meta.has_bias:
            y0 = y0 + b_refs[-1][0, :].astype(cdt)
        cb = meta.c_msg
        for j, r in enumerate(m_rows[0]):
            out_rows[int(r)] = y0[:, j * cb : (j + 1) * cb]
        # m > 0 butterflies
        for m in range(1, meta.mmax + 1):
            rows_m = m_rows[m]
            wb = w_refs[wi][:]
            wi += 1
            y = rowdot(rows_m, wb).astype(cdt)
            for j, r in enumerate(rows_m):
                out_rows[int(r)] = y[:, j * cb : (j + 1) * cb]
        msg = jnp.concatenate([o[:, None, :] for o in out_rows], axis=1)
        out_refs[0][:] = msg
        if meta.extra:
            out_refs[1][:] = ex
    else:
        out_refs[0][:] = ex


def _rc_kernel_out(v_ref, *refs, meta: RCMeta, pairs, w_shapes):
    """(msg, extra) --GEMMs--> t --rad--> u --pairs--> y."""
    idx = 0
    msg_ref = None
    if not meta.m0:
        msg_ref = refs[idx]
        idx += 1
    ex_ref = None
    if meta.extra:
        ex_ref = refs[idx]
        idx += 1
    rad_ref = None
    if meta.has_rad:
        rad_ref = refs[idx]
        idx += 1
    n_w = len(w_shapes)
    w_refs = refs[idx : idx + n_w]
    idx += n_w
    b_refs = refs[idx : idx + (1 if meta.has_bias else 0)]
    idx += len(b_refs)
    y_ref = refs[idx]

    cdt = y_ref.dtype
    ca = meta.c_rot
    cb = meta.c_msg
    m_rows = meta.m_rows()
    u = [None] * meta.n_rows()

    def rowdot(x3, rs, w):
        # sum of per-row dots (see _rc_kernel_in.rowdot: lane-axis concat
        # of row slices is not Mosaic-compilable)
        acc = None
        for j, r in enumerate(rs):
            d = jnp.dot(
                x3[:, int(r), :], w[j * cb : (j + 1) * cb, :],
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        return acc

    wi = 0
    # m = 0 block: extra and msg rows feed the same output rows
    t0 = None
    if meta.extra:
        ex = ex_ref[:]
        w_ex = w_refs[wi][:]
        wi += 1
        t0 = jnp.dot(ex, w_ex, preferred_element_type=jnp.float32)
    if not meta.m0:
        msg = msg_ref[:]
        w0 = w_refs[wi][:]
        wi += 1
        t0m = rowdot(msg, m_rows[0], w0)
        t0 = t0m if t0 is None else t0 + t0m
    if meta.has_bias:
        t0 = t0 + b_refs[0][0, :].astype(jnp.float32)
    for j, r in enumerate(m_rows[0]):
        u[int(r)] = t0[:, j * ca : (j + 1) * ca]
    if not meta.m0:
        for m in range(1, meta.mmax + 1):
            rows_m = m_rows[m]
            wb = w_refs[wi][:]
            wi += 1
            t = rowdot(msg, rows_m, wb)
            for j, r in enumerate(rows_m):
                u[int(r)] = t[:, j * ca : (j + 1) * ca]

    groups = meta.rad_group_rows()
    if rad_ref is not None:
        rad = rad_ref[:].astype(jnp.float32)
        for r in range(meta.n_rows()):
            g = int(groups[r])
            u[r] = u[r] * rad[:, g * ca : (g + 1) * ca]

    v = v_ref[:].astype(jnp.float32)
    _, n_out = meta.pairs()
    acc = _pairs_to_rows(v, lambda ki: u[ki], pairs, n_out)
    T = v.shape[0]
    zero = jnp.zeros((T, ca), dtype=jnp.float32)
    y = jnp.concatenate(
        [(a if a is not None else zero)[:, None, :] for a in acc], axis=1
    )
    y_ref[:] = y.astype(cdt)


# ── pallas_call wrappers ───────────────────────────────────────────────────


def _compiler_params():
    if pltpu is not None and not _interpret():
        return {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            )
        }
    return {}


def _sorted_pairs(meta: RCMeta, v):
    """Pairs sorted by input row (kernel streams each input row once)."""
    pairs, _ = meta.pairs()
    order = np.lexsort((pairs[:, 0], pairs[:, 1]))
    return pairs[order], v[:, order]


def _call_in(x, v, rad, ws, bs, meta: RCMeta):
    E = x.shape[0]
    P = v.shape[1]
    n_tiles = E // _TILE
    pairs_k, v = _sorted_pairs(meta, v)
    w_shapes = tuple(w.shape for w in ws)

    in_specs = [
        _block_spec((_TILE, P), lambda i: (i, 0)),
        _block_spec((_TILE, x.shape[1], meta.c_rot), lambda i: (i, 0, 0)),
    ]
    args = [v, x]
    if meta.has_rad:
        in_specs.append(_block_spec((_TILE, rad.shape[1]), lambda i: (i, 0)))
        args.append(rad)
    for w in ws:
        in_specs.append(_block_spec(w.shape, lambda i: (0, 0)))
        args.append(w)
    if meta.has_bias:
        for b in bs:
            b2 = b[None, :]
            in_specs.append(_block_spec(b2.shape, lambda i: (0, 0)))
            args.append(b2)

    if meta.m0:
        out_shape = jax.ShapeDtypeStruct((E, meta.extra), x.dtype)
        out_specs = _block_spec((_TILE, meta.extra), lambda i: (i, 0))
    else:
        shapes = [
            jax.ShapeDtypeStruct((E, meta.n_rows(), meta.c_msg), x.dtype)
        ]
        specs = [
            _block_spec((_TILE, meta.n_rows(), meta.c_msg), lambda i: (i, 0, 0))
        ]
        if meta.extra:
            shapes.append(jax.ShapeDtypeStruct((E, meta.extra), x.dtype))
            specs.append(_block_spec((_TILE, meta.extra), lambda i: (i, 0)))
        out_shape = tuple(shapes) if len(shapes) > 1 else shapes[0]
        out_specs = tuple(specs) if len(specs) > 1 else specs[0]

    kern = functools.partial(
        _rc_kernel_in, meta=meta, pairs=pairs_k, w_shapes=w_shapes
    )
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        **_compiler_params(),
    )(*args)
    if meta.m0:
        return None, out
    if meta.extra:
        return out[0], out[1]
    return out, None


def _call_out(msg, extra, v, rad, ws, bs, meta: RCMeta):
    E = v.shape[0]
    P = v.shape[1]
    n_tiles = E // _TILE
    pairs_k, v = _sorted_pairs(meta, v)
    w_shapes = tuple(w.shape for w in ws)
    dtype = msg.dtype if msg is not None else extra.dtype

    in_specs = [_block_spec((_TILE, P), lambda i: (i, 0))]
    args = [v]
    if not meta.m0:
        in_specs.append(
            _block_spec((_TILE, meta.n_rows(), meta.c_msg), lambda i: (i, 0, 0))
        )
        args.append(msg)
    if meta.extra:
        in_specs.append(_block_spec((_TILE, meta.extra), lambda i: (i, 0)))
        args.append(extra)
    if meta.has_rad:
        in_specs.append(_block_spec((_TILE, rad.shape[1]), lambda i: (i, 0)))
        args.append(rad)
    for w in ws:
        in_specs.append(_block_spec(w.shape, lambda i: (0, 0)))
        args.append(w)
    if meta.has_bias:
        b2 = bs[-1][None, :]
        in_specs.append(_block_spec(b2.shape, lambda i: (0, 0)))
        args.append(b2)

    _, n_out = meta.pairs()
    kern = functools.partial(
        _rc_kernel_out, meta=meta, pairs=pairs_k, w_shapes=w_shapes
    )
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=_block_spec((_TILE, n_out, meta.c_rot), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((E, n_out, meta.c_rot), dtype),
        interpret=_interpret(),
        **_compiler_params(),
    )(*args)


# ── custom VJPs (mutual adjoints on the linear-in-x part) ──────────────────
#
# Residuals are the primal inputs themselves (weights, values, rad, x/msg);
# the intermediates are recomputed VPU-cheap where needed.  Every backward op
# is differentiable, giving exact arbitrary-order AD.


def _rad_rows(rad, meta: RCMeta):
    """[E, G*ca] -> [E, n_rows, ca] by the static row->group gather."""
    E = rad.shape[0]
    g = rad.reshape(E, -1, meta.c_rot)
    return g[:, meta.rad_group_rows(), :]


def _gemm_inputs(t, meta: RCMeta):
    """Per-m flattened GEMM inputs [E, w_in_m] from rows [E, n_rows, c]."""
    E = t.shape[0]
    outs = []
    for rows_m in meta.m_rows():
        outs.append(
            t[:, rows_m, :].reshape(E, len(rows_m) * t.shape[2])
        )
    return outs


def _rows_from_gemm(parts, meta: RCMeta, c):
    """Inverse of _gemm_inputs: per-m [E, w_m] parts -> [E, n_rows, c]."""
    E = parts[0].shape[0]
    cat = jnp.concatenate(
        [p.reshape(E, -1, c) for p in parts], axis=1
    )  # m-primary order
    if meta.m0:
        return cat  # rank order == row order
    return cat[:, meta.info()["inv_perm"], :]


def _group_sum(x_rows, meta: RCMeta):
    """[E, n_rows, ca] -> [E, G*ca]: sum real/imag rows sharing a group."""
    E = x_rows.shape[0]
    if meta.m0:
        return x_rows.reshape(E, -1)
    onehot = jnp.asarray(meta.info()["group_onehot"], x_rows.dtype)
    return jnp.einsum("erc,rg->egc", x_rows, onehot).reshape(E, -1)


def _split_msg_grads(g_msg, g_extra, meta: RCMeta):
    """Per-m GEMM-output cotangents [E, w_out_m] (+ extra for m0)."""
    parts = []
    if not meta.m0:
        E = g_msg.shape[0]
        for rows_m in meta.m_rows():
            parts.append(
                g_msg[:, rows_m, :].reshape(E, len(rows_m) * meta.c_msg)
            )
    return parts


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _rc_in(x, v_self, v_adj, rad, ws, bs, meta: RCMeta):
    return _call_in(x, v_self, rad, ws, bs, meta)


def _rc_in_fwd(x, v_self, v_adj, rad, ws, bs, meta):
    # fwd re-enters the custom_vjp function itself (NOT the bare pallas_call)
    # so grad-of-grad re-hits this rule instead of differentiating the
    # custom-call — the same shield used by ops/pallas/s2act.py.
    return (
        _rc_in(x, v_self, v_adj, rad, ws, bs, meta),
        (x, v_self, v_adj, rad, ws),
    )


def _rc_in_bwd(meta, res, g):
    x, v_self, v_adj, rad, ws = res
    g_msg, g_extra = g
    if g_extra is None and meta.extra:
        g_extra = jnp.zeros((x.shape[0], meta.extra), x.dtype)
    if g_msg is None and not meta.m0:
        g_msg = jnp.zeros(
            (x.shape[0], meta.n_rows(), meta.c_msg), x.dtype
        )

    ws_t = tuple(jnp.swapaxes(w, 0, 1) for w in ws)
    dx = _rc_out(
        g_msg, g_extra if meta.extra else None, v_adj, v_self, rad,
        ws_t, (), meta.adjoint(),
    )

    # weight / bias / radial cotangents via recomputed intermediates
    u = _apply_core(
        x, v_self, v_adj, _PairsAux(meta.lmax, meta.mmax, meta.pair_kind)
    )  # [E, n_rows, c_rot]
    t = u * _rad_rows(rad, meta).astype(u.dtype) if meta.has_rad else u
    xins = _gemm_inputs(t, meta)
    gparts = _split_msg_grads(g_msg, g_extra, meta)

    dws = []
    dt_parts = []
    wi = 0
    if meta.extra:
        dws.append(jnp.einsum("ei,ej->ij", xins[0], g_extra))
        wi += 1
    if not meta.m0:
        dws.append(jnp.einsum("ei,ej->ij", xins[0], gparts[0]))
        for m in range(1, meta.mmax + 1):
            dws.append(jnp.einsum("ei,ej->ij", xins[m], gparts[m]))
    drad = None
    if meta.has_rad:
        # dt = g @ W^T per m (m0 rows get extra + msg contributions)
        dt0 = None
        if meta.extra:
            dt0 = g_extra @ ws_t[0]
        if not meta.m0:
            base = 1 if meta.extra else 0
            d0 = gparts[0] @ ws_t[base]
            dt0 = d0 if dt0 is None else dt0 + d0
            dt_parts.append(dt0)
            for m in range(1, meta.mmax + 1):
                dt_parts.append(gparts[m] @ ws_t[base + m])
        else:
            dt_parts.append(dt0)
        dt_rows = _rows_from_gemm(dt_parts, meta, meta.c_rot)
        drad = _group_sum(
            u.astype(jnp.float32) * dt_rows.astype(jnp.float32), meta
        ).astype(rad.dtype)

    dbs = ()
    if meta.has_bias:
        db = []
        if meta.extra:
            db.append(g_extra.sum(0).astype(jnp.float32))
        if not meta.m0:
            db.append(gparts[0].sum(0).astype(jnp.float32))
        dbs = tuple(db)

    return (
        dx,
        jnp.zeros_like(v_self),
        jnp.zeros_like(v_adj),
        drad,
        tuple(dws),
        dbs,
    )


_rc_in.defvjp(_rc_in_fwd, _rc_in_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _rc_out(msg, extra, v_self, v_adj, rad, ws, bs, meta: RCMeta):
    return _call_out(msg, extra, v_self, rad, ws, bs, meta)


def _rc_out_fwd(msg, extra, v_self, v_adj, rad, ws, bs, meta):
    # re-enter the custom_vjp (see _rc_in_fwd)
    return (
        _rc_out(msg, extra, v_self, v_adj, rad, ws, bs, meta),
        (msg, extra, v_self, v_adj, rad, ws, bs),
    )


def _rc_out_bwd(meta, res, g):
    msg, extra, v_self, v_adj, rad, ws, bs = res
    ws_t = tuple(jnp.swapaxes(w, 0, 1) for w in ws)
    dmsg, dextra = _rc_in(
        g, v_adj, v_self, rad, ws_t, (), meta.adjoint()
    )

    # a_raw = pairs_adjoint(g): the pre-rad conv-output cotangent rows
    a_raw = _apply_core(
        g, v_adj, v_self,
        _PairsAux(meta.lmax, meta.mmax, meta.adjoint().pair_kind),
    )  # [E, n_rows, c_rot]
    a = (
        a_raw * _rad_rows(rad, meta).astype(a_raw.dtype)
        if meta.has_rad
        else a_raw
    )
    aparts = _gemm_inputs(a, meta)

    dws = []
    xins = None
    if meta.extra:
        dws.append(jnp.einsum("ei,ej->ij", extra, aparts[0]))
    if not meta.m0:
        xins = _gemm_inputs(msg, meta)
        dws.append(jnp.einsum("ei,ej->ij", xins[0], aparts[0]))
        for m in range(1, meta.mmax + 1):
            dws.append(jnp.einsum("ei,ej->ij", xins[m], aparts[m]))

    drad = None
    if meta.has_rad:
        # t (pre-rad conv outputs incl. bias), recomputed with plain GEMMs;
        # u = rad o t  =>  drad = t o du = t o a_raw
        t_parts = []
        t0 = None
        base = 0
        if meta.extra:
            t0 = extra @ ws[0]
            base = 1
        if not meta.m0:
            d0 = xins[0] @ ws[base]
            t0 = d0 if t0 is None else t0 + d0
        if bs:
            t0 = t0 + bs[-1].astype(t0.dtype)
        t_parts.append(t0)
        if not meta.m0:
            for m in range(1, meta.mmax + 1):
                t_parts.append(xins[m] @ ws[base + m])
        t_rows = _rows_from_gemm(t_parts, meta, meta.c_rot)
        drad = _group_sum(
            t_rows.astype(jnp.float32) * a_raw.astype(jnp.float32), meta
        ).astype(rad.dtype)

    dbs = ()
    if meta.has_bias:
        # u = rad o (t + b): the bias cotangent is the POST-rad dt = a
        dbs = (a.astype(jnp.float32)[:, meta.m_rows()[0], :]
               .reshape(a.shape[0], -1).sum(0),)

    return (
        dmsg if not meta.m0 else None,
        dextra if meta.extra else None,
        jnp.zeros_like(v_self),
        jnp.zeros_like(v_adj),
        drad,
        tuple(dws),
        dbs,
    )


_rc_out.defvjp(_rc_out_fwd, _rc_out_bwd)


# ── public API (pads E outside the custom_vjp) ─────────────────────────────


def _pad_e(arr, pad):
    if arr is None or pad == 0:
        return arr
    width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, width)


def fused_rotate_conv(
    x, w: WignerDense, rad, ws, bs, *,
    c_msg: int, extra: int, m0: bool = False, rescaled: bool = False,
):
    """rotate-to-edge + radial + SO(2)-conv, fused.

    Args:
        x: [E, K_full, c_rot] global-frame edge features.
        w: per-edge dense Wigner values (compute_wigner_dense).
        rad: [E, G*c_rot] radial modulation in m-primary group order, or None.
        ws: per-m weights ``(w_extra?, w_m0, wbig_1..)`` — ``w_extra`` first
            when ``extra > 0``; only ``(w_extra,)`` when ``m0``.
        bs: biases ``(b_extra?, b_m0?)`` or () for no bias.
        c_msg: per-coefficient output channels.
        extra: extra m=0 output channels.
        m0: GATA m0-only path (extra output only).
        rescaled: use the truncation-rescaled value tables (adjoint of
            rotate_from; used for conv-2's backward, not by callers).
    Returns:
        (msg [E, K_red, c_msg] | None, extra [E, extra] | None)
    """
    if m0 and rad is not None:
        # the m0 kernel reads only the first L0 radial groups; slice OUTSIDE
        # the custom_vjp so the rad cotangent shape matches (the slice's own
        # VJP zero-pads the unused m > 0 groups)
        rad = rad[:, : (w.lmax + 1) * x.shape[2]]
    meta = RCMeta(
        lmax=w.lmax, mmax=w.mmax, c_rot=x.shape[2], c_msg=c_msg,
        extra=extra, has_rad=rad is not None, has_bias=len(bs) > 0,
        direction="in", m0=m0, pair_kind="to_m0" if m0 else "to",
    )
    info = _pair_info(w.lmax, w.mmax)
    if m0:
        m0c = info["m0_cols"]
        v_self = w.v_to[:, m0c]
        v_adj = w.v_to[:, m0c[info["sigma_m0"]]]
    elif rescaled:
        v_self, v_adj = w.v_to_res, w.v_from_res
    else:
        v_self, v_adj = w.v_to, w.v_from
    E = x.shape[0]
    pad = (-E) % _TILE
    out = _rc_in(
        _pad_e(x, pad), _pad_e(v_self, pad), _pad_e(v_adj, pad),
        _pad_e(rad, pad), tuple(ws), tuple(bs), meta,
    )
    if pad:
        out = tuple(o[:E] if o is not None else None for o in out)
    return out


def fused_conv_rotate(
    msg, w: WignerDense, rad, ws, bs, *,
    c_rot: int, extra_in=None, m0: bool = False,
):
    """SO(2)-conv + rotate-from-edge (truncation rescale folded), fused.

    Args:
        msg: [E, K_red, c_msg] edge-frame features (None when ``m0``).
        extra_in: [E, X] invariant input block feeding the m=0 GEMM.
        ws: ``(w_extra?, w_m0, wbig_1..)`` oriented input->output.
        bs: ``(b_m0,)`` or ().
        c_rot: per-coefficient output channels.
    Returns:
        y [E, K_full, c_rot] global-frame features.
    """
    if m0 and rad is not None:
        # match the m0 rad slicing of fused_rotate_conv (cotangent shape)
        rad = rad[:, : (w.lmax + 1) * c_rot]
    extra = 0 if extra_in is None else extra_in.shape[1]
    c_msg = msg.shape[2] if msg is not None else c_rot
    meta = RCMeta(
        lmax=w.lmax, mmax=w.mmax, c_rot=c_rot, c_msg=c_msg,
        extra=extra, has_rad=rad is not None, has_bias=len(bs) > 0,
        direction="out", m0=m0, pair_kind="from_m0" if m0 else "from",
    )
    if m0:
        info = _pair_info(w.lmax, w.mmax)
        m0c = info["m0_cols"]
        v_self = w.v_to[:, m0c[info["sigma_m0"]]]
        v_adj = w.v_to[:, m0c]
    else:
        v_self, v_adj = w.v_from_res, w.v_to_res
    E = (msg if msg is not None else extra_in).shape[0]
    pad = (-E) % _TILE
    out = _rc_out(
        _pad_e(msg, pad), _pad_e(extra_in, pad), _pad_e(v_self, pad),
        _pad_e(v_adj, pad), _pad_e(rad, pad), tuple(ws), tuple(bs), meta,
    )
    return out[:E] if pad else out
