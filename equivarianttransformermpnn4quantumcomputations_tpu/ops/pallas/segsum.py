"""Scatter-free gathers/aggregation: matmul-transpose custom_vjp pair.

Production entry point: ``gather_nodes`` — a node->edge gather whose
backward (at EVERY derivative order) is a one-hot MXU matmul instead of the
serialized TPU scatter-add (+9% end-to-end on the flagship train step).

Message aggregation ``out[n] = sum_{e: dst[e]=n} msg[e]`` is a scatter-add —
serialized and slow through XLA on TPU (measured 2.7 ms scatter / 1.8 ms via
one-hot matmul at [10240, 25, 128] -> [512, ...]).  A streaming Pallas
accumulate kernel (per-edge dynamic row writes into a VMEM-resident output)
was prototyped and REJECTED: Mosaic requires dynamic row indices to be
provably 8-aligned, so it never lowered; the one-hot GEMM has the same FLOPs
and is the production path (PERF.md "Kernel findings").

Differentiation: linear in ``vals`` — custom_vjp with a gather backward; the
gather itself carries a custom_vjp whose backward is the matmul segment-sum,
so every AD order stays scatter-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["gather_nodes", "segment_sum_sorted_pallas"]


def _seg_sum_impl(vals, ids, num_segments: int, blocks):
    # vals: [E, ...] with trailing dims UNFLATTENED — flattening (K, C) into
    # one axis retiles the minor (lane) dimension and XLA materializes it as
    # a real data shuffle (~0.7 ms per [10240, 25, 128] tensor on v5e); with
    # trailing dims kept, the per-graph split below is a free leading-dim
    # bitcast and the contraction keeps (K, C) as grouped non-contracting
    # dims of one dot_general.
    E = vals.shape[0]
    if blocks is not None:
        blocks = blocks[:3]
    if blocks is not None:
        # graph-uniform blocking (collate(uniform=True)): graph b owns nodes
        # [b*n_max, (b+1)*n_max) and edges [b*e_max, (b+1)*e_max), so the
        # one-hot contraction is B independent [e_max, n_max] blocks —
        # O(B e_max n_max D) instead of O(E N D): LINEAR in batch size
        # (the flat one-hot was quadratic, the batch-16 regression of
        # PERF.md).  Out-of-block ids produce all-zero one-hot rows.
        B, n_max, e_max = blocks
        v = vals.reshape((B, e_max) + vals.shape[1:])
        lid = ids.reshape(B, e_max) - (
            jnp.arange(B, dtype=ids.dtype) * n_max
        )[:, None]
        onehot = (
            lid[:, :, None] == jnp.arange(n_max, dtype=ids.dtype)[None, None, :]
        ).astype(vals.dtype)
        # explicit dot_general: batch b, contract e, rhs free dims (K, C, …)
        # grouped — an ellipsis einsum here lowers as a VPU multiply+reduce
        # (broadcast one-hot), ~3x the MXU dot (profile runs/profile_r4c)
        out = jax.lax.dot_general(
            onehot, v, (((1,), (1,)), ((0,), (0,)))
        )  # [B, n_max, ...]
        return out.reshape((B * n_max,) + vals.shape[1:])
    from ...utils.backend import on_tpu

    if on_tpu():
        # one-hot MXU matmul: TPU scatter-add is serialized (~1.5x slower)
        onehot = (
            ids[:, None] == jnp.arange(num_segments, dtype=ids.dtype)[None, :]
        ).astype(vals.dtype)
        return jax.lax.dot_general(onehot, vals, (((0,), (0,)), ((), ())))
    return jax.ops.segment_sum(vals, ids, num_segments=num_segments)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _seg_sum(vals, ids, num_segments, blocks):
    return _seg_sum_impl(vals, ids, num_segments, blocks)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gather(src, ids, num_segments, blocks):
    return src[ids]


def _seg_sum_fwd(vals, ids, num_segments, blocks):
    return _seg_sum(vals, ids, num_segments, blocks), ids


def _seg_sum_bwd(num_segments, blocks, ids, dout):
    return _gather(dout, ids, num_segments, blocks), None


def _gather_fwd(src, ids, num_segments, blocks):
    return _gather(src, ids, num_segments, blocks), ids


def _gather_bwd(num_segments, blocks, ids, dvals):
    return _seg_sum(dvals, ids, num_segments, blocks), None


_seg_sum.defvjp(_seg_sum_fwd, _seg_sum_bwd)
_gather.defvjp(_gather_fwd, _gather_bwd)


def segment_sum_sorted_pallas(vals, ids, num_segments: int, blocks=None):
    """Scatter-free segment-sum over the leading axis (one-hot GEMM on TPU).

    vals: [E, ...]; returns [num_segments, ...].  Caller must pre-zero
    masked entries (ops/segment.py wrapper does).  ``blocks=(B, n_max,
    e_max)`` enables the graph-uniform block-diagonal path.  Name kept from
    the rejected streaming-kernel experiment; dispatch is the matmul pair.
    """
    return _seg_sum(vals, ids, num_segments, blocks)


def gather_nodes(x, ids, blocks=None, canonical_dst=False):
    """Node->edge gather whose EVERY-order transpose is the matmul
    segment-sum instead of an XLA scatter-add.

    A plain ``x[ids]`` is fast forward, but its vjp is a scatter-add — the
    slowest primitive on TPU — and it appears 6-10x per layer per AD
    traversal in this architecture.  The `_gather`/`_seg_sum` custom_vjp pair
    alternates gather <-> one-hot-matmul to any derivative order.
    ``blocks=(B, n_max, e_max)`` makes every transpose block-diagonal
    (linear in batch size; requires collate(uniform=True) layout).

    ``canonical_dst=True`` with a fixed-degree layout (``blocks`` carries a
    4th element k; collate(fixed_degree=True): edge slot e belongs to dst
    node e // k) turns the gather into a broadcast — its transpose is a pure
    [N, k, D] axis-1 reduction: no one-hot GEMM, no layout copies, exact at
    every AD order through plain XLA.

    x: [N, ...]; ids: [E] -> [E, ...].
    """
    N = x.shape[0]
    if canonical_dst and blocks is not None and len(blocks) > 3:
        k = blocks[3]
        out = jnp.broadcast_to(
            x[:, None], (N, k) + x.shape[1:]
        )
        return out.reshape((N * k,) + x.shape[1:])
    return _gather(x, ids, N, blocks)
