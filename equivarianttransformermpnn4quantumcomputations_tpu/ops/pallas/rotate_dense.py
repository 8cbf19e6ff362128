"""Pallas TPU kernel: block-sparse dense-Wigner edge rotation (pairs form).

The factored rotate (ops/pallas/rotate.py) re-runs the 5-stage
``Xz(a) J Xz(b) J Xz(g)`` chain inside every rotate call — ~6.6 GFLOP per
call at [E 5120, K 25, C 256] through narrow (K<=50) MXU dots that reach only
a few percent of peak.  But the composite Wigner-D of an edge is a fixed
block-diagonal matrix with only ``P = sum_l r_l (2l+1)`` nonzero entries
(115 at lmax 4 / mmax 2): building it ONCE per step and applying it per call
is 5-20x fewer FLOPs, and the application needs no matmul at all —

    y[e, ko, :] = sum_p  v[e, p] * x[e, ki_p, :]      (pairs p with out-row ko)

is a static unrolled chain of VPU multiply-adds over perfectly lane-aligned
[T, C] tiles: one HBM read of x, one write of y, no transposes, no MXU.

Differentiation is closed over the pair tables (the operator is linear):
the adjoint of ``to_edge`` is ``from_edge`` on the transposed pair list with
the same values, so two mutually-recursive custom_vjps give exact
arbitrary-order AD with zero residual tensors (same scheme as
ops/pallas/rotate.py).

Conventions follow ops/rotation.py (real SH, z-primary; reference
equivariant rotation: models/EquiformerV2Functions/so3.py:128-195, with the
sqrt((2l+1)/(2 mmax+1)) truncation rescale of so3.py:175-195).
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

__all__ = [
    "WignerDense",
    "compute_wigner_dense",
    "rotate_to_edge_dense",
    "rotate_from_edge_dense",
    "rotate_to_edge_m0_dense",
]


def _interpret() -> bool:
    from ...utils.backend import on_tpu

    return not on_tpu()


def _block_spec(shape, index_map=None):
    kwargs = {}
    if _VMEM is not None:
        kwargs["memory_space"] = _VMEM
    return pl.BlockSpec(shape, index_map, **kwargs)


# ── static pair tables ─────────────────────────────────────────────────────


@functools.lru_cache(maxsize=None)
def _pair_info(lmax: int, mmax: int):
    """Static (ko, ki) pair lists of the block-diagonal truncated Wigner-D.

    ``to`` direction: rows = reduced layout (|m| <= mmax within each l),
    cols = full layout.  Pairs are enumerated l-major, row-major within each
    block — the same order `compute_wigner_dense` packs the values in.
    ``sigma``: permutation with pairs_from[q] = transpose(pairs_to[sigma[q]]),
    where pairs_from is the transposed list re-sorted l-major/row-major with
    rows now in the FULL layout.
    """
    from ..irreps import layout as get_layout
    from ..rotation import _m_keep_rows

    lay = get_layout(lmax, mmax)
    pairs_to = []  # (ko_reduced, ki_full)
    off_red = 0
    for l in range(lmax + 1):
        rows = _m_keep_rows(l, mmax) if mmax < l else np.arange(2 * l + 1)
        for r in rows:
            for c in range(2 * l + 1):
                pairs_to.append((off_red, l * l + c))
            off_red += 1
    pairs_to = np.asarray(pairs_to, dtype=np.int32)  # [P, 2]

    # transposed list, re-sorted to (row-major over the FULL layout)
    trans = pairs_to[:, ::-1]  # (ko_full, ki_reduced)
    order = np.lexsort((trans[:, 1], trans[:, 0]))
    pairs_from = trans[order]
    sigma = order.astype(np.int32)  # v_from[:, q] = v_to[:, sigma[q]]

    rescale_full = np.asarray(lay.rescale, dtype=np.float32)  # [K_full]
    # m = 0 output rows of the reduced layout, and the pair subset hitting them
    m0_rows = np.nonzero(np.asarray(lay.m_complex) == 0)[0]
    m0_rank = {r: i for i, r in enumerate(m0_rows)}
    m0_cols = np.asarray(
        [p for p, (ko, _) in enumerate(pairs_to) if ko in m0_rank],
        dtype=np.int32,
    )
    pairs_to_m0 = np.asarray(
        [(m0_rank[ko], ki) for (ko, ki) in pairs_to if ko in m0_rank],
        dtype=np.int32,
    )
    # adjoint of the m0-restricted map: full-row outputs, m0-rank inputs
    trans0 = pairs_to_m0[:, ::-1]
    order0 = np.lexsort((trans0[:, 1], trans0[:, 0]))
    pairs_from_m0 = trans0[order0]
    sigma_m0 = order0.astype(np.int32)
    return dict(
        pairs_to=pairs_to, pairs_from=pairs_from, sigma=sigma,
        rescale_full=rescale_full, m0_cols=m0_cols,
        pairs_to_m0=pairs_to_m0, pairs_from_m0=pairs_from_m0,
        sigma_m0=sigma_m0, K_red=len(lay.m_complex),
        K_full=(lmax + 1) ** 2, n_m0=len(m0_rows),
    )


class WignerDense:
    """Per-edge composite Wigner-D values in pairs form (gradient-stopped).

    Four [E, P] value tables (to / from and their rescale-folded adjoints),
    built once per forward and shared by every rotate in the network.
    Registered as a pytree so it flows through jit/remat/scan.
    """

    def __init__(self, lmax, mmax, v_to, v_from, v_from_res, v_to_res):
        self.lmax = int(lmax)
        self.mmax = int(mmax)
        self.v_to = v_to                # to_edge, no rescale
        self.v_from = v_from            # from_edge, no rescale (= adj of to)
        self.v_from_res = v_from_res    # from_edge with truncation rescale
        self.v_to_res = v_to_res        # adj of from_edge-with-rescale


jax.tree_util.register_pytree_node(
    WignerDense,
    lambda w: (
        (w.v_to, w.v_from, w.v_from_res, w.v_to_res),
        (w.lmax, w.mmax),
    ),
    lambda aux, ch: WignerDense(aux[0], aux[1], *ch),
)


def compute_wigner_dense(lmax: int, mmax: int, edge_vec) -> WignerDense:
    """Composite per-edge Wigner-D values, built once per forward.

    Uses `compute_wigner_blocks` (HIGHEST-precision 3-stage build,
    ops/rotation.py:159) then packs the truncated blocks into flat [E, P]
    value tables in pairs_to order; the from/rescale variants are static
    gathers/broadcasts of the same values.
    """
    from ..rotation import _m_keep_rows, compute_wigner_blocks

    info = _pair_info(lmax, mmax)
    blocks = compute_wigner_blocks(lmax, edge_vec).blocks
    cols = []
    for l in range(lmax + 1):
        D = blocks[l]  # [E, 2l+1, 2l+1]
        if mmax < l:
            D = D[:, _m_keep_rows(l, mmax), :]
        cols.append(D.reshape(D.shape[0], -1))
    v_to = jnp.concatenate(cols, axis=1)  # [E, P], f32
    v_from = v_to[:, info["sigma"]]
    res_from = info["rescale_full"][info["pairs_from"][:, 0]]
    v_from_res = v_from * jnp.asarray(res_from)[None, :]
    res_to = info["rescale_full"][info["pairs_to"][:, 1]]
    v_to_res = v_to * jnp.asarray(res_to)[None, :]
    return WignerDense(lmax, mmax, v_to, v_from, v_from_res, v_to_res)


# ── kernel ────────────────────────────────────────────────────────────────


def _pairs_kernel(v_ref, x_ref, o_ref, *, pairs, n_out):
    x = x_ref[:]                          # [T, Ki, C]
    v = v_ref[:].astype(jnp.float32)      # [T, P]
    T, Ki, C = x.shape
    acc = [None] * n_out
    # group by input row: each x slice is read once, fanned out to its rows
    p = 0
    P = pairs.shape[0]
    while p < P:
        ki = int(pairs[p, 1])
        xk = x[:, ki, :].astype(jnp.float32)  # [T, C]
        while p < P and int(pairs[p, 1]) == ki:
            ko = int(pairs[p, 0])
            term = v[:, p][:, None] * xk
            acc[ko] = term if acc[ko] is None else acc[ko] + term
            p += 1
    zero = jnp.zeros((T, C), dtype=jnp.float32)
    out = jnp.concatenate(
        [(a if a is not None else zero)[:, None, :] for a in acc], axis=1
    )
    o_ref[:] = out.astype(o_ref.dtype)


def _call_pairs(v, x, pairs: np.ndarray, n_out: int):
    """x: [E, Ki, C] (E tile-aligned), v: [E, P] -> [E, n_out, C]."""
    E, Ki, C = x.shape
    P = v.shape[1]
    T = 128
    # full-C blocks up to 512 channels; block at 128 beyond (VMEM)
    Cb = 128 if (C % 128 == 0 and C > 512) else C
    n_tiles = E // T
    n_cblk = C // Cb

    # pairs sorted by input row so the kernel's ki-grouping is contiguous
    order = np.lexsort((pairs[:, 0], pairs[:, 1]))
    pairs_k = pairs[order]
    v = v[:, order]

    kwargs = {}
    if pltpu is not None and not _interpret():
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"),
        )
    kern = functools.partial(_pairs_kernel, pairs=pairs_k, n_out=n_out)
    return pl.pallas_call(
        kern,
        grid=(n_tiles, n_cblk),
        in_specs=[
            _block_spec((T, P), lambda i, j: (i, 0)),
            _block_spec((T, Ki, Cb), lambda i, j: (i, 0, j)),
        ],
        out_specs=_block_spec((T, n_out, Cb), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((E, n_out, C), x.dtype),
        interpret=_interpret(),
        **kwargs,
    )(v, x)


# ── mutually-recursive custom_vjp pair (linear operator) ──────────────────
#
# Static metadata (pair lists, output widths) rides on a hashable aux object
# passed as a non-diff argument; only (x, v_self, v_adj) are traced.


class _PairsAux:
    """Hashable static pair metadata for one direction + its adjoint."""

    def __init__(self, lmax, mmax, kind):
        self.lmax, self.mmax, self.kind = lmax, mmax, kind

    def _info(self):
        return _pair_info(self.lmax, self.mmax)

    def pairs(self):
        info = self._info()
        if self.kind == "to":
            return info["pairs_to"], info["K_red"]
        if self.kind == "from":
            return info["pairs_from"], info["K_full"]
        if self.kind == "to_m0":
            return info["pairs_to_m0"], info["n_m0"]
        return info["pairs_from_m0"], info["K_full"]  # from_m0

    def flip(self):
        other = {
            "to": "from", "from": "to",
            "to_m0": "from_m0", "from_m0": "to_m0",
        }[self.kind]
        return _PairsAux(self.lmax, self.mmax, other)

    def __hash__(self):
        return hash((self.lmax, self.mmax, self.kind))

    def __eq__(self, other):
        return (
            isinstance(other, _PairsAux)
            and (self.lmax, self.mmax, self.kind)
            == (other.lmax, other.mmax, other.kind)
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _apply_core(x, v_self, v_adj, aux: _PairsAux):
    pairs, n_out = aux.pairs()
    return _call_pairs(v_self, x, pairs, n_out)


def _apply_fwd(x, v_self, v_adj, aux):
    return _apply_core(x, v_self, v_adj, aux), (v_self, v_adj)


def _apply_bwd(aux, res, g):
    v_self, v_adj = res
    return (
        _apply_core(g, v_adj, v_self, aux.flip()),
        jnp.zeros_like(v_self),
        jnp.zeros_like(v_adj),
    )


_apply_core.defvjp(_apply_fwd, _apply_bwd)


# E is padded to a tile multiple OUTSIDE the custom_vjp (a jnp.pad inside a
# custom_vjp primal corrupts residual binding under lax.scan + 2nd-order AD;
# see ops/pallas/s2act.py)
_TILE = 128


def _padded_apply(x, v_self, v_adj, aux):
    E = x.shape[0]
    pad = (-E) % _TILE
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        v_self = jnp.pad(v_self, ((0, pad), (0, 0)))
        v_adj = jnp.pad(v_adj, ((0, pad), (0, 0)))
    out = _apply_core(x, v_self, v_adj, aux)
    return out[:E] if pad else out


def rotate_to_edge_dense(w: WignerDense, x, layout):
    """[E, K_full, C] -> [E, K_red, C] via the pairs kernel."""
    aux = _PairsAux(w.lmax, w.mmax, "to")
    return _padded_apply(x, w.v_to, w.v_from, aux)


def rotate_from_edge_dense(w: WignerDense, x, layout):
    """[E, K_red, C] -> [E, K_full, C] (truncation rescale applied)."""
    aux = _PairsAux(w.lmax, w.mmax, "from")
    return _padded_apply(x, w.v_from_res, w.v_to_res, aux)


def rotate_to_edge_m0_dense(w: WignerDense, x, layout):
    """[E, K_full, C] -> [E, lmax+1, C]: only the m = 0 output rows."""
    info = _pair_info(w.lmax, w.mmax)
    aux = _PairsAux(w.lmax, w.mmax, "to_m0")
    m0 = info["m0_cols"]
    # adjoint values in pairs_from_m0 order: sigma_m0 permutes the m0 subset
    return _padded_apply(
        x, w.v_to[:, m0], w.v_to[:, m0[info["sigma_m0"]]], aux
    )
