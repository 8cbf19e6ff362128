"""Degree-wise SO(3) linear layers and the eSCN SO(2) convolution.

TPU-native re-designs of the reference:
* ``SO3_LinearV2`` (reference so3.py:698-739): one [lmax+1, C_out, C_in]
  weight, expanded to the coefficient axis by a static gather and applied with
  a single einsum — maps directly onto an MXU matmul with the (K*N) batch dim.
* ``SO2_Convolution`` / ``SO2_m_Convolution`` (reference so2_ops.py:11-204):
  per-order complex-pair linear maps.  Here the m-primary reshuffle is a
  static gather (not the reference's dense ``to_m`` matmul, so3.py:322-339)
  and each order m is one batched matmul pair — a short static Python loop
  (mmax <= 6) that XLA fuses; no dynamic shapes.

The complex structure: in the edge-aligned frame, a residual rotation by theta
about the edge acts on the coefficient pair (c_{+m}, c_{-m}) as multiplication
of c_{+m} + i c_{-m} by e^{i m theta}; a complex-linear map in that pair
commutes with the rotation, which is exactly what these layers implement
(reference so2_ops.py:53-61).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.irreps import IrrepsLayout
from .layers import RadialMLP, fan_in_normal
from .partition import partitioned, role_names

__all__ = ["SO3Linear", "SO2Conv", "SO2Linear"]


import functools


@functools.lru_cache(maxsize=None)
def _rad_chunk_map(lay: IrrepsLayout):
    """l-primary row -> radial chunk index (the radial MLP emits one
    Cin-wide chunk per (l, m >= 0) pair, m-primary order; the +m and -m
    rows share their pair's chunk)."""
    m_abs = np.abs(np.asarray(lay.m_complex))
    ls = np.asarray(lay.l_harmonic)
    base = np.cumsum([0] + [int(lay.m_size[m]) for m in range(lay.mmax)])
    chunk = np.empty(len(ls), dtype=np.int32)
    for k in range(len(ls)):
        m = int(m_abs[k])
        chunk[k] = base[m] + (int(ls[k]) - m)
    return chunk



class SO3Linear(nn.Module):
    """Per-degree linear map over [N, K, C] features; bias only on l = 0.

    ``tp``: tensor-parallel role ('col' shards out_features, 'row' shards
    in_features — see nn/partition.py); None = replicated.
    """

    in_features: int
    out_features: int
    lmax: int
    tp: str | None = None

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            partitioned(fan_in_normal(), role_names(3, self.tp)),
            (self.lmax + 1, self.in_features, self.out_features),
        )
        b = self.param(
            "bias",
            partitioned(
                nn.initializers.zeros,
                role_names(1, "col" if self.tp == "col" else None),
            ),
            (self.out_features,),
        )
        expand = np.concatenate(
            [np.full(2 * l + 1, l) for l in range(self.lmax + 1)]
        )
        wk = w[expand].astype(x.dtype)  # [K, C_in, C_out]
        out = jnp.einsum("nki,kio->nko", x, wk)
        return out.at[:, 0, :].add(b.astype(out.dtype))


class SO2Conv(nn.Module):
    """SO(2) convolution over all orders m in the edge-aligned frame.

    Args mirror the reference SO2_Convolution (so2_ops.py:64-134):
        layout: (lmax, mmax) coefficient layout of the input/output.
        in_channels / out_channels: per-coefficient channel widths.
        extra_m0: extra invariant output channels carved out of the m=0 block
            (attention alpha features and gate scalars).
        rad_channels: if given, an invariant edge MLP producing per-edge,
            per-(l,m)-input feature-wise weights (``internal_weights=False``
            path); None means no radial modulation.

    Call: (x [E, K_red, C_in], edge_scalars [E, D] | None)
        -> (out [E, K_red, C_out], extra [E, extra_m0] | None)
    """

    layout: IrrepsLayout
    in_channels: int
    out_channels: int
    extra_m0: int = 0
    rad_channels: Optional[Sequence[int]] = None
    # tensor-parallel role: 'col' shards the packed output dim of every
    # per-m weight, 'row' the packed input dim (nn/partition.py).  The
    # radial MLP stays replicated either way — its outputs rescale *inputs*
    # edge-wise (sharding it would add an all-gather per conv).
    tp: str | None = None
    # m0_only: the caller consumes ONLY the m = 0 outputs (GATA value path —
    # reference Gotennet fork drops the m > 0 message, transformer_block.py:
    # 311-325).  Input is the pre-sliced m = 0 block [E, lmax+1, C_in]
    # (ops/rotation.py:rotate_to_edge_m0); the m > 0 weights are still
    # DECLARED (parameter-structure parity with the full conv) but their
    # GEMMs are skipped, and the returned message is None.
    m0_only: bool = False

    @nn.compact
    def __call__(self, x, edge_scalars=None):
        lay = self.layout
        E = x.shape[0]
        Cin, Cout = self.in_channels, self.out_channels
        L0 = int(lay.m_size[0])

        # radial modulation: one weight per distinct (l, m>=0) input coeff
        rad = None
        if self.rad_channels is not None:
            n_rad = int(lay.m_size.sum()) * Cin
            rad = RadialMLP(tuple(self.rad_channels) + (n_rad,))(edge_scalars)

        w_names = role_names(2, self.tp)
        b_names = role_names(1, "col" if self.tp == "col" else None)
        w0 = self.param(
            "w_m0", partitioned(fan_in_normal(), w_names),
            (L0 * Cin, self.extra_m0 + L0 * Cout),
        )
        b0 = self.param(
            "b_m0", partitioned(nn.initializers.zeros, b_names),
            (self.extra_m0 + L0 * Cout,),
        )
        wms = []
        for m in range(1, lay.mmax + 1):
            Lm = int(lay.m_size[m])
            wms.append((
                self.param(f"w_m{m}_r", partitioned(fan_in_normal(), w_names),
                           (Lm * Cin, Lm * Cout)),
                self.param(f"w_m{m}_i", partitioned(fan_in_normal(), w_names),
                           (Lm * Cin, Lm * Cout)),
            ))

        def wbig_of(wr, wi, dt):
            # complex butterfly as ONE matmul:
            #   [yr yi] = [xr xi] @ [[wr, wi], [-wi, wr]]
            # (half the matmul launches, same FLOPs, better MXU tiling)
            return jnp.concatenate(
                [
                    jnp.concatenate([wr, wi], axis=1),
                    jnp.concatenate([-wi, wr], axis=1),
                ],
                axis=0,
            ).astype(dt)

        # ── fused-kernel path: one pallas call covers every m-block ──────
        # (ops/pallas/so2conv.py: reads l-primary rows directly, writes
        # l-primary rows directly — the to_m/from_m permutes, the output
        # concat and the K-major layout copies of the XLA lowering all
        # disappear).  Default OFF: the isolated site runs ~3x faster than
        # the XLA lowering (conv1_full fwd 3.03 -> ~1 ms), but COMPOSED
        # into the training step it measured a net regression on the
        # flagship (194.4 -> 247.9 ms device; the mutual-adjoint AD chain
        # multiplies custom calls and the dW einsum re-concatenates input
        # rows) and neutral on QM9 — the same composed-vs-isolated verdict
        # as round 3's rotate+conv fusion (PERF.md).  conv_fused='on' /
        # 'force' (interpret) enables for experiments.
        from ..utils import flags as _flags
        from ..utils.backend import on_tpu

        cf = _flags.current().conv_fused
        if (
            not self.m0_only
            and (cf == "force" or (cf == "on" and on_tpu()))
        ):
            from ..ops.pallas.so2conv import so2conv_fused, so2conv_supported

            if so2conv_supported(lay, Cin, Cout, self.extra_m0):
                xs = x
                if rad is not None:
                    # one fused elementwise pass (chunk c applies to both
                    # the +m and -m rows of its (l, m) pair)
                    chunk = _rad_chunk_map(lay)
                    rr = rad.reshape(E, int(lay.m_size.sum()), Cin)
                    xs = x * rr[:, chunk, :].astype(x.dtype)
                wb = [w0.astype(x.dtype)]
                for wr, wi in wms:
                    wb.append(wbig_of(wr, wi, x.dtype))
                y, extra = so2conv_fused(
                    xs, tuple(wb), lay.lmax, lay.mmax, Cout, self.extra_m0
                )
                b = b0.astype(y.dtype)
                if self.extra_m0:
                    extra = extra + b[: self.extra_m0]
                m0_rows = np.nonzero(np.asarray(lay.m_complex) == 0)[0]
                bias_rows = (
                    jnp.zeros((y.shape[1], Cout), y.dtype)
                    .at[jnp.asarray(m0_rows)]
                    .set(b[self.extra_m0 :].reshape(L0, Cout))
                )
                y = y + bias_rows[None]
                return y, (extra if self.extra_m0 else None)

        xm = x if self.m0_only else x[:, lay.to_m_perm, :]  # m-primary

        out_blocks = []
        extra = None
        offset = 0
        offset_rad = 0

        # m = 0 block: plain dense over (degrees x channels)
        x0 = xm[:, :L0, :].reshape(E, L0 * Cin)
        if rad is not None:
            x0 = x0 * rad[:, : L0 * Cin]
            offset_rad = L0 * Cin
        y0 = x0 @ w0.astype(x0.dtype) + b0.astype(x0.dtype)
        if self.extra_m0:
            extra = y0[:, : self.extra_m0]
            y0 = y0[:, self.extra_m0 :]
        out_blocks.append(y0.reshape(E, L0, Cout))
        offset = L0

        if self.m0_only:
            return None, (extra if self.extra_m0 else y0)

        # m > 0: complex-pair linear maps
        for m in range(1, lay.mmax + 1):
            Lm = int(lay.m_size[m])
            xmm = xm[:, offset : offset + 2 * Lm, :]
            xr = xmm[:, :Lm, :].reshape(E, Lm * Cin)
            xi = xmm[:, Lm:, :].reshape(E, Lm * Cin)
            if rad is not None:
                rm = rad[:, offset_rad : offset_rad + Lm * Cin]
                xr = xr * rm
                xi = xi * rm
                offset_rad += Lm * Cin
            wr, wi = wms[m - 1]
            xcat = jnp.concatenate([xr, xi], axis=1)
            y = (xcat @ wbig_of(wr, wi, xcat.dtype)).reshape(E, 2, Lm, Cout)
            out_blocks.append(y.reshape(E, 2 * Lm, Cout))
            offset += 2 * Lm

        out_m = jnp.concatenate(out_blocks, axis=1)
        out = out_m[:, lay.from_m_perm, :]
        return out, extra


class SO2Linear(nn.Module):
    """SO(2) linear over all m without the complex pair-mixing — the same
    layout/radial plumbing as SO2Conv but each (m, +/-) row is mapped by one
    real matrix (reference so2_ops.py:207-332; present in the reference for
    API parity, unused by the final models).

    Call: (x [E, K_red, C_in], edge_scalars | None)
        -> out [E, K_red, C_out]
    """

    layout: IrrepsLayout
    in_channels: int
    out_channels: int
    rad_channels: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x, edge_scalars=None):
        lay = self.layout
        E = x.shape[0]
        Cin, Cout = self.in_channels, self.out_channels
        xm = x[:, lay.to_m_perm, :]

        rad = None
        if self.rad_channels is not None:
            n_rad = int(lay.m_size.sum()) * Cin
            rad = RadialMLP(tuple(self.rad_channels) + (n_rad,))(edge_scalars)

        out_blocks = []
        offset = 0
        offset_rad = 0
        L0 = int(lay.m_size[0])
        x0 = xm[:, :L0, :].reshape(E, L0 * Cin)
        if rad is not None:
            x0 = x0 * rad[:, : L0 * Cin]
            offset_rad = L0 * Cin
        w0 = self.param("w_m0", fan_in_normal(), (L0 * Cin, L0 * Cout))
        b0 = self.param("b_m0", nn.initializers.zeros, (L0 * Cout,))
        out_blocks.append((x0 @ w0 + b0).reshape(E, L0, Cout))
        offset = L0

        for m in range(1, lay.mmax + 1):
            Lm = int(lay.m_size[m])
            xmm = xm[:, offset : offset + 2 * Lm, :].reshape(E, 2, Lm * Cin)
            if rad is not None:
                rm = rad[:, offset_rad : offset_rad + Lm * Cin]
                xmm = xmm * rm[:, None, :]
                offset_rad += Lm * Cin
            w = self.param(
                f"w_m{m}", fan_in_normal(), (Lm * Cin, Lm * Cout)
            )
            y = jnp.einsum("esi,io->eso", xmm, w)
            out_blocks.append(y.reshape(E, 2 * Lm, Cout))
            offset += 2 * Lm

        out_m = jnp.concatenate(out_blocks, axis=1)
        return out_m[:, lay.from_m_perm, :]
