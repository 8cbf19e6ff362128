"""Masked segment reductions for padded, static-shape graphs.

TPU-native replacement for ``index_add_`` scatter-sums
(reference so3.py:304-318) and ``torch_geometric.utils.softmax``
(reference transformer_block.py:315).  Edges and nodes are padded to static
sizes; an explicit boolean mask marks real entries.  All-padded segments
produce exact zeros (the reference handles the analogous all-pad rows with
``nan_to_num``; here the masked formulation never creates NaNs).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

__all__ = ["segment_sum", "segment_mean", "segment_softmax"]


import os

# TPU scatter-add is serialized and slow (~2.7 ms for a [10k, 25, 128]
# reduction); a one-hot matmul runs on the MXU instead.  The one-hot is
# built on the fly (fused compare), FLOPs 2*E*N*D — cheap at these sizes.
_MATMUL_SEGMENT_MAX_ELEMS = int(
    os.environ.get("ETQ_SEGSUM_MATMUL_MAX", 64_000_000)
)


def segment_sum(values, segment_ids, num_segments: int, mask=None,
                method: str = "auto", sorted_ids: bool = False,
                blocks=None, fixed_dst: bool = False):
    """Sum ``values`` ([E, ...]) into ``num_segments`` buckets.

    Padded entries (mask False) contribute zero.  method: 'auto' | 'scatter'
    | 'matmul' (one-hot GEMM).  'auto' prefers the matmul path on sizes where
    it wins — much faster than the serialized TPU scatter-add (a streaming
    pallas accumulate kernel was prototyped and rejected: Mosaic cannot prove
    per-edge dynamic row indices 8-aligned; the one-hot GEMM has the same
    FLOPs and is the production path, see PERF.md).  ``sorted_ids`` is
    accepted for API stability (the matmul path doesn't need it).

    ``blocks=(B, n_max, e_max)``: graph-uniform block-diagonal one-hot
    (requires data/graph.py collate(uniform=True) layout) — O(B e_max n_max)
    instead of O(E N), linear in batch size.

    ``fixed_dst=True`` + a 4-element ``blocks=(B, n_max, e_max, k)``
    (fixed-degree layout, collate(fixed_degree=True)): the caller asserts
    ``segment_ids`` is the canonical dst pattern (edge slot e -> node
    e // k), and the reduction becomes a plain [N, k, D] axis-1 sum — no
    GEMM at all.
    """
    del sorted_ids
    if mask is not None:
        values = values * mask.astype(values.dtype).reshape(
            mask.shape + (1,) * (values.ndim - 1)
        )
    E = values.shape[0]
    if (
        fixed_dst
        and blocks is not None
        and len(blocks) > 3
        and E == num_segments * blocks[3]
    ):
        # fixed-degree layout (collate(fixed_degree=True)): edge slot e
        # belongs to dst node e // k — the segment sum is a plain [N, k, D]
        # axis-1 reduction (VPU/HBM-bound, no one-hot GEMM, no copies)
        k = blocks[3]
        return values.reshape((num_segments, k) + values.shape[1:]).sum(1)
    if blocks is not None and values.ndim > 1:
        B, n_max, e_max = blocks[:3]
        if E == B * e_max and num_segments == B * n_max:
            # trailing dims kept unflattened: merging (K, C) retiles the lane
            # dim (a real ~0.7 ms shuffle at [10240, 25, 128]); the leading
            # split below is a free bitcast and the einsum keeps them as
            # grouped non-contracting dims (see ops/pallas/segsum.py)
            v = values.reshape((B, e_max) + values.shape[1:])
            lid = segment_ids.reshape(B, e_max) - (
                jnp.arange(B, dtype=segment_ids.dtype) * n_max
            )[:, None]
            onehot = (
                lid[:, :, None]
                == jnp.arange(n_max, dtype=segment_ids.dtype)[None, None, :]
            ).astype(values.dtype)
            # explicit dot_general (batch b, contract e, rhs free dims
            # grouped): ellipsis einsum lowers as VPU multiply+reduce
            out = jax.lax.dot_general(
                onehot, v, (((1,), (1,)), ((0,), (0,)))
            )
            return out.reshape((num_segments,) + values.shape[1:])
    use_matmul = method == "matmul" or (
        method == "auto"
        and values.ndim > 1
        and E * num_segments <= _MATMUL_SEGMENT_MAX_ELEMS
    )
    if use_matmul:
        onehot = (
            segment_ids[:, None]
            == jnp.arange(num_segments, dtype=segment_ids.dtype)[None, :]
        ).astype(values.dtype)
        return jax.lax.dot_general(
            onehot, values, (((0,), (0,)), ((), ()))
        )
    return jax.ops.segment_sum(
        values, segment_ids, num_segments=num_segments
    )


def segment_mean(values, segment_ids, num_segments: int, mask=None,
                 blocks=None, fixed_dst: bool = False):
    s = segment_sum(values, segment_ids, num_segments, mask, blocks=blocks,
                    fixed_dst=fixed_dst)
    ones = jnp.ones(values.shape[0] if mask is None else mask.shape[0],
                    dtype=values.dtype)
    if fixed_dst and blocks is not None and len(blocks) > 3:
        m = ones if mask is None else mask.astype(values.dtype)
        cnt = m.reshape(num_segments, blocks[3]).sum(1)
    else:
        cnt = segment_sum(ones, segment_ids, num_segments, mask)
    cnt = cnt.reshape(cnt.shape + (1,) * (values.ndim - 1))
    return s / jnp.maximum(cnt, 1.0)


def _seg_scan_combine(a, b):
    """Associative combine for segmented (max, sum) scans.

    carry = (maxv, sumv, flag); flag True = start of a new segment at the
    left edge of the element's range.
    """
    m1, s1, f1 = a
    m2, s2, f2 = b
    f2e = f2.reshape(f2.shape + (1,) * (m1.ndim - f2.ndim))
    m = jnp.where(f2e, m2, jnp.maximum(m1, m2))
    s = jnp.where(f2e, s2, s1 + s2)
    return m, s, f1 | f2


def segment_softmax_sorted(logits, segment_ids, mask=None):
    """Scatter-free segment softmax for dst-SORTED edges.

    Uses forward+backward segmented associative scans (VPU-only; TPU
    scatter-adds are serialized and ~50x slower at these shapes).  Requires
    ``segment_ids`` non-decreasing over real entries with padding entries
    contiguous (the data/graph.py collate invariant).
    """
    in_dtype = logits.dtype
    logits = logits.astype(jnp.float32)
    neg = jnp.asarray(-1e30, dtype=logits.dtype)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (logits.ndim - 1))
        logits = jnp.where(m, logits, neg)

    boundary = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            segment_ids[1:] != segment_ids[:-1],
        ]
    )

    def seg_reduce(vals):
        """Per-element (segment max, segment sum) over the FULL segment."""
        # forward inclusive scan: prefix (max, sum) within segment
        fm, fs, _ = jax.lax.associative_scan(
            _seg_scan_combine, (vals, vals, boundary)
        )
        # backward: suffix within segment (recompute boundaries for the
        # reversed id sequence)
        rev_ids = segment_ids[::-1]
        rb = jnp.concatenate(
            [jnp.ones((1,), bool), rev_ids[1:] != rev_ids[:-1]]
        )
        bm, bs, _ = jax.lax.associative_scan(
            _seg_scan_combine, (vals[::-1], vals[::-1], rb)
        )
        bm, bs = bm[::-1], bs[::-1]
        seg_max = jnp.maximum(fm, bm)
        seg_sum = fs + bs - vals
        return seg_max, seg_sum

    seg_max, _ = seg_reduce(logits)
    seg_max = jax.lax.stop_gradient(jnp.maximum(seg_max, neg))
    ex = jnp.exp(logits - seg_max)
    if mask is not None:
        ex = ex * mask.reshape(mask.shape + (1,) * (ex.ndim - 1)).astype(
            ex.dtype
        )
    _, denom = seg_reduce(ex)
    return (ex / jnp.maximum(denom, 1e-16)).astype(in_dtype)


def _segment_softmax_blocked(logits, segment_ids, blocks, mask):
    """Scatter-free segment softmax on the graph-uniform layout.

    Per block: max over edges via a masked where-reduction on the one-hot
    [e_max, n_max] incidence (a few MB at production shapes), sums via block
    matmuls — no TPU scatter anywhere, any AD order.
    """
    B, n_max, e_max = blocks
    in_dtype = logits.dtype
    E = logits.shape[0]
    lg = logits.astype(jnp.float32).reshape((B, e_max, -1))  # [B, e, H]
    neg = jnp.asarray(-1e30, jnp.float32)
    if mask is not None:
        lg = jnp.where(mask.reshape(B, e_max, 1), lg, neg)
    lid = segment_ids.reshape(B, e_max) - (
        jnp.arange(B, dtype=segment_ids.dtype) * n_max
    )[:, None]
    onehot = (
        lid[:, :, None] == jnp.arange(n_max, dtype=segment_ids.dtype)[None, None, :]
    )                                                        # [B, e, n] bool
    # segment max: [B, e, n, H] masked where -> max over e
    seg_max = jnp.max(
        jnp.where(onehot[..., None], lg[:, :, None, :], neg), axis=1
    )                                                        # [B, n, H]
    seg_max = jax.lax.stop_gradient(jnp.maximum(seg_max, neg))
    oh = onehot.astype(jnp.float32)
    per_edge_max = jnp.einsum("ben,bnh->beh", oh, seg_max)
    ex = jnp.exp(lg - per_edge_max)
    if mask is not None:
        ex = ex * mask.reshape(B, e_max, 1).astype(ex.dtype)
    denom = jnp.einsum("ben,beh->bnh", oh, ex)
    per_edge_denom = jnp.einsum("ben,bnh->beh", oh, denom)
    out = ex / jnp.maximum(per_edge_denom, 1e-16)
    return out.reshape((E,) + logits.shape[1:]).astype(in_dtype)


def _segment_softmax_fixed(logits, k: int, mask):
    """Fixed-degree softmax: [N*k, H] -> per-node softmax over the k slots.
    Pure reshape + axis-1 reductions; no scatter, no one-hot, no scans."""
    in_dtype = logits.dtype
    E = logits.shape[0]
    lg = logits.astype(jnp.float32).reshape((E // k, k, -1))     # [N, k, H]
    neg = jnp.asarray(-1e30, jnp.float32)
    if mask is not None:
        lg = jnp.where(mask.reshape(E // k, k, 1), lg, neg)
    seg_max = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(lg, axis=1, keepdims=True), neg)
    )
    ex = jnp.exp(lg - seg_max)
    if mask is not None:
        ex = ex * mask.reshape(E // k, k, 1).astype(ex.dtype)
    denom = jnp.sum(ex, axis=1, keepdims=True)
    out = ex / jnp.maximum(denom, 1e-16)
    return out.reshape((E,) + logits.shape[1:]).astype(in_dtype)


def segment_softmax(logits, segment_ids, num_segments: int, mask=None,
                    sorted_ids: bool = False, blocks=None,
                    fixed_dst: bool = False):
    """Numerically-stable softmax over segments of the leading axis.

    Args:
        logits: [E, ...] attention logits (softmax along axis 0 within segments).
        segment_ids: [E] target-node index per edge.
        mask: [E] bool, False for padded edges (their weight becomes 0).
        sorted_ids: if True, use the scatter-free sorted-scan path.
        blocks: (B, n_max, e_max) graph-uniform layout -> fully scatter-free
            block-dense path; with a 4th element k AND ``fixed_dst=True``
            (fixed-degree layout), a plain [N, k, H] axis-1 softmax.
    Returns:
        [E, ...] normalized weights summing to 1 within each real segment.
    """
    if (
        fixed_dst
        and blocks is not None
        and len(blocks) > 3
        and logits.shape[0] == num_segments * blocks[3]
    ):
        return _segment_softmax_fixed(logits, blocks[3], mask)
    if blocks is not None and logits.ndim > 1:
        B, n_max, e_max = blocks[:3]
        if logits.shape[0] == B * e_max and num_segments == B * n_max:
            return _segment_softmax_blocked(
                logits, segment_ids, blocks[:3], mask
            )
    if sorted_ids:
        return segment_softmax_sorted(logits, segment_ids, mask)
    in_dtype = logits.dtype
    logits = logits.astype(jnp.float32)  # softmax stats in f32 under bf16
    neg = jnp.asarray(-1e30, dtype=logits.dtype)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (logits.ndim - 1))
        logits = jnp.where(m, logits, neg)
    seg_max = jax.ops.segment_max(
        logits, segment_ids, num_segments=num_segments
    )
    # empty segments give -inf max; clamp so the subtraction stays finite
    seg_max = jnp.maximum(seg_max, neg)
    seg_max = jax.lax.stop_gradient(seg_max)
    shifted = logits - seg_max[segment_ids]
    ex = jnp.exp(shifted)
    if mask is not None:
        ex = ex * mask.reshape(mask.shape + (1,) * (ex.ndim - 1)).astype(ex.dtype)
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    return (ex / jnp.maximum(denom[segment_ids], 1e-16)).astype(in_dtype)
