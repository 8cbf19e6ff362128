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


def _seg_sum_impl(vals2d, ids, num_segments: int):
    E, D = vals2d.shape
    if jax.default_backend() == "tpu":
        # one-hot MXU matmul: TPU scatter-add is serialized (~1.5x slower)
        onehot = (
            ids[:, None] == jnp.arange(num_segments, dtype=ids.dtype)[None, :]
        ).astype(vals2d.dtype)
        return jnp.einsum("en,ed->nd", onehot, vals2d)
    return jax.ops.segment_sum(vals2d, ids, num_segments=num_segments)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _seg_sum(vals2d, ids, num_segments):
    return _seg_sum_impl(vals2d, ids, num_segments)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather(src2d, ids, num_segments):
    return src2d[ids]


def _seg_sum_fwd(vals2d, ids, num_segments):
    return _seg_sum(vals2d, ids, num_segments), ids


def _seg_sum_bwd(num_segments, ids, dout):
    return _gather(dout, ids, num_segments), None


def _gather_fwd(src2d, ids, num_segments):
    return _gather(src2d, ids, num_segments), ids


def _gather_bwd(num_segments, ids, dvals):
    return _seg_sum(dvals, ids, num_segments), None


_seg_sum.defvjp(_seg_sum_fwd, _seg_sum_bwd)
_gather.defvjp(_gather_fwd, _gather_bwd)


def segment_sum_sorted_pallas(vals, ids, num_segments: int):
    """Scatter-free segment-sum over the leading axis (one-hot GEMM on TPU).

    vals: [E, ...]; returns [num_segments, ...].  Caller must pre-zero
    masked entries (ops/segment.py wrapper does).  Name kept from the
    rejected streaming-kernel experiment; dispatch is the matmul pair.
    """
    E = vals.shape[0]
    flat = vals.reshape(E, -1)
    out = _seg_sum(flat, ids, num_segments)
    return out.reshape((num_segments,) + vals.shape[1:])


def gather_nodes(x, ids):
    """Node->edge gather whose EVERY-order transpose is the matmul
    segment-sum instead of an XLA scatter-add.

    A plain ``x[ids]`` is fast forward, but its vjp is a scatter-add — the
    slowest primitive on TPU — and it appears 6-10x per layer per AD
    traversal in this architecture.  The `_gather`/`_seg_sum` custom_vjp pair
    alternates gather <-> one-hot-matmul to any derivative order.

    x: [N, ...]; ids: [E] -> [E, ...].
    """
    N = x.shape[0]
    flat = x.reshape(N, -1)
    out = _gather(flat, ids, N)
    return out.reshape((ids.shape[0],) + x.shape[1:])
