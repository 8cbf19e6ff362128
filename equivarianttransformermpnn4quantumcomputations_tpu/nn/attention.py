"""SO(2)-equivariant graph attention (baseline EquiformerV2 + GATA variant).

Re-design of reference ``SO2EquivariantGraphAttention``
(models/EquiformerV2Functions/transformer_block.py:40-336) and its GATA fork
(models/NewFunctions/Gotennet_morethaninspired/transformer_block.py:50-366),
unified behind config flags instead of nine forked files.

Pipeline per edge (all static shapes, masked padding):
  gather src/dst features -> concat (2C) -> [m-share radial scale] ->
  rotate into the edge frame (Wigner) -> SO(2) conv 1 (+ extra m=0 channels) ->
  {gate | separable-S2 | GATA} value activation -> SO(2) conv 2 ->
  masked segment softmax over incoming edges -> alpha-weighted values ->
  rotate back -> masked segment sum to targets -> per-degree linear proj.

GATA differences (flagged, reference Gotennet fork):
  * extra m=0 grows to alpha + S*hidden with S = 1 + 2*lmax;
  * h_j / X_j are taken from the *target* node in the unrotated frame
    (faithful to the reference fork, which gathers ``x_target``);
  * alpha is computed before the value activation and (optionally) scales
    ``attn_output`` by its head-mean — ``normalize_attn_output=False``
    reproduces the ``no_attn_output_normalization`` ablation fork.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.irreps import IrrepsLayout
from ..ops.rotation import (
    WignerBlocks,
    rotate_from_edge,
    rotate_to_edge,
    rotate_to_edge_m0,
)
from ..ops.s2grid import S2Grid
from ..ops.pallas.segsum import gather_nodes
from ..ops.segment import segment_softmax, segment_sum
from .activations import gate_activation, s2_activation, separable_s2_activation
from .gata import GATAValueActivation
from .layers import Dense, RadialMLP, smooth_leaky_relu
from .so3_layers import SO2Conv, SO3Linear

__all__ = ["GraphAttention"]

def _atom_edge_embedding_init(key, shape, dtype=jnp.float32):
    # reference: uniform(-0.001, 0.001) (transformer_block.py:125-126)
    return jax.random.uniform(key, shape, dtype, -0.001, 0.001)


class GraphAttention(nn.Module):
    layout_full: IrrepsLayout   # (lmax, lmax)
    layout_red: IrrepsLayout    # (lmax, mmax)
    grid_red: S2Grid            # grid at (lmax, mmax) for value S2 act
    sphere_channels: int
    hidden_channels: int
    num_heads: int
    attn_alpha_channels: int
    attn_value_channels: int
    output_channels: int
    max_num_elements: int
    edge_channels_list: Sequence[int]
    use_atom_edge_embedding: bool = True
    use_m_share_rad: bool = False
    use_attn_renorm: bool = True
    use_gate_act: bool = False
    use_sep_s2_act: bool = True
    alpha_drop: float = 0.0
    # GATA options
    gata: bool = False
    # GATA v1 (Gotennet_inspired fork, reference equiformerv2_MatPES_GATA.py):
    # no t_ij/HTR, unprojected X_j, full-width value act (requires mmax==lmax
    # and hidden_channels==sphere_channels), baseline alpha application
    gata_v1: bool = False
    edge_channels: int = 0          # t_ij width (GATA)
    normalize_attn_output: bool = True
    # phi-every-layer variant: thread raw distance RBF into the value act
    use_phi_every_layer: bool = False
    num_rbf: int = 0
    # (B, n_max, e_max) graph-uniform layout: block-diagonal segment ops
    blocks: tuple | None = None

    @nn.compact
    def __call__(
        self,
        x,                 # [N, K_full, C]
        atomic_numbers,    # [N] int
        edge_scalars,      # [E, D] distance RBF (maybe + shared atom emb)
        edge_src,          # [E] int
        edge_dst,          # [E] int
        edge_mask,         # [E] bool
        wigner: WignerBlocks,
        t_ij=None,         # [E, edge_channels] (GATA)
        rl_ij=None,        # [E, K_full - 1] (GATA)
        phi_r=None,        # [E, num_rbf] raw distance RBF (phi-every-layer)
        deterministic: bool = True,
    ):
        lmax = self.layout_full.lmax
        num_nodes = x.shape[0]
        ec = list(self.edge_channels_list)

        # ── invariant edge features ───────────────────────────────────────
        if self.use_atom_edge_embedding:
            src_emb = nn.Embed(
                self.max_num_elements, ec[-1], embedding_init=_atom_edge_embedding_init
            )(atomic_numbers[edge_src])
            dst_emb = nn.Embed(
                self.max_num_elements, ec[-1], embedding_init=_atom_edge_embedding_init
            )(atomic_numbers[edge_dst])
            x_edge = jnp.concatenate([edge_scalars, src_emb, dst_emb], axis=1)
            ec[0] = ec[0] + 2 * ec[-1]
        else:
            x_edge = edge_scalars

        # ── gather node features to edges ─────────────────────────────────
        x_src = gather_nodes(x, edge_src, blocks=self.blocks)
        x_dst = gather_nodes(x, edge_dst, blocks=self.blocks,
                             canonical_dst=True)
        if self.gata or self.gata_v1:
            # unrotated-frame neighbour features (reference Gotennet fork
            # transformer_block.py:255-267 gathers the *target* embedding)
            h_j = x_dst[:, 0, :]
            X_j = x_dst[:, 1:, :]
        msg = jnp.concatenate([x_src, x_dst], axis=2)  # [E, K_full, 2C]

        # ── m-share radial scaling ────────────────────────────────────────
        if self.use_m_share_rad:
            w = RadialMLP(tuple(ec) + (2 * self.sphere_channels * (lmax + 1),))(
                x_edge
            )
            w = w.reshape(-1, lmax + 1, 2 * self.sphere_channels)
            import numpy as np

            expand = np.concatenate(
                [np.full(2 * l + 1, l) for l in range(lmax + 1)]
            )
            msg = msg * w[:, expand, :]

        # ── rotate into edge frame ────────────────────────────────────────
        # GATA value paths rebuild their stream from the UNROTATED X_j and
        # consume only the m = 0 block of the rotated message (alpha +
        # attn_output scalars) — rotate/convolve just that block.  Exactly
        # equal to the full path (same params; tests/test_variants.py);
        # flags.override(m0_only=False) / ETQ_M0_ONLY=0 opts out.
        from ..utils import flags as _flags

        m0_only = (
            (self.gata or self.gata_v1)
            and self.use_sep_s2_act
            and not self.use_gate_act
            and _flags.current().m0_only
        )

        alpha_ch = self.num_heads * self.attn_alpha_channels
        if self.use_gate_act:
            extra_m0 = alpha_ch + lmax * self.hidden_channels
        elif self.use_sep_s2_act:
            if self.gata or self.gata_v1:
                S = 1 + 2 * lmax
                extra_m0 = alpha_ch + S * self.hidden_channels
            else:
                extra_m0 = alpha_ch + self.hidden_channels
        else:
            extra_m0 = alpha_ch

        # ── SO(2) conv 1 with extra m=0 channels ──────────────────────────
        # (a fused rotate+conv Pallas kernel was built and measured in r3 —
        # per-call overheads made it a net regression; removed in r4, see
        # PERF.md "fused rotate+SO2-conv")
        if m0_only:
            msg = rotate_to_edge_m0(wigner, msg, self.layout_red)
        else:
            msg = rotate_to_edge(wigner, msg, self.layout_red)

        msg, x0_extra = SO2Conv(
            layout=self.layout_red,
            in_channels=2 * self.sphere_channels,
            out_channels=self.hidden_channels,
            extra_m0=extra_m0,
            rad_channels=None if self.use_m_share_rad else tuple(ec),
            m0_only=m0_only,
            tp="col",
            name="so2_conv_1",
        )(msg, x_edge if not self.use_m_share_rad else None)

        # ── attention logits ──────────────────────────────────────────────
        def compute_alpha(x0_alpha):
            a = x0_alpha.reshape(-1, self.num_heads, self.attn_alpha_channels)
            if self.use_attn_renorm:
                a = nn.LayerNorm(epsilon=1e-5, name="alpha_norm")(a)
            a = smooth_leaky_relu(a)
            dot = self.param(
                "alpha_dot",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32,
                    -1.0 / (self.attn_alpha_channels ** 0.5),
                    1.0 / (self.attn_alpha_channels ** 0.5),
                ),
                (self.num_heads, self.attn_alpha_channels),
            )
            logits = jnp.einsum("ehk,hk->eh", a, dot)
            # blocks: fully scatter-free block-dense softmax; otherwise the
            # scatter path (measured on par with the sorted-scan path at H=8)
            return segment_softmax(
                logits, edge_dst, num_segments=num_nodes, mask=edge_mask,
                blocks=self.blocks, fixed_dst=True,
            )

        # ── value activation ──────────────────────────────────────────────
        if self.use_gate_act:
            x0_gating = x0_extra[:, alpha_ch:]
            x0_alpha = x0_extra[:, :alpha_ch]
            msg = gate_activation(
                x0_gating, msg, lmax, self.layout_red.mmax, self.hidden_channels
            )
            alpha = compute_alpha(x0_alpha)
        elif self.use_sep_s2_act:
            x0_alpha = x0_extra[:, :alpha_ch]
            if self.gata_v1:
                # v1: gates straight from so2_conv_1, no t_ij bias, no alpha
                # scaling of the gates (reference Gotennet_inspired/
                # transformer_block.py:311-325)
                if self.layout_red.mmax != lmax:
                    raise ValueError(
                        "gata_v1 requires mmax == lmax (full-width value "
                        "act; reference config_cosinelearningGATA.py:110)"
                    )
                if self.hidden_channels != self.sphere_channels:
                    raise ValueError(
                        "gata_v1 requires attn_hidden_channels == "
                        "sphere_channels (unprojected X_j)"
                    )
                from .gata import gata_value_activation_v1

                msg = gata_value_activation_v1(
                    x0_extra[:, alpha_ch:], X_j, rl_ij, lmax,
                    self.hidden_channels,
                )
                alpha = compute_alpha(x0_alpha)
            elif self.gata:
                attn_output = x0_extra[:, alpha_ch:]
                # alpha computed BEFORE the value act (reference fork :315-324)
                alpha = compute_alpha(x0_alpha)
                if self.normalize_attn_output:
                    attn_output = attn_output * jnp.mean(
                        alpha, axis=1, keepdims=True
                    ).astype(attn_output.dtype)
                msg = GATAValueActivation(
                    sphere_channels=self.sphere_channels,
                    hidden_channels=self.hidden_channels,
                    edge_channels=self.edge_channels,
                    lmax=lmax,
                    mmax=self.layout_red.mmax,
                    use_phi=self.use_phi_every_layer,
                    num_rbf=self.num_rbf,
                    name="value_act",
                )(attn_output, t_ij, h_j, X_j, rl_ij, phi_r)
            else:
                x0_gating = x0_extra[:, alpha_ch:]
                msg = separable_s2_activation(x0_gating, msg, self.grid_red)
                alpha = compute_alpha(x0_alpha)
        else:
            msg = s2_activation(msg, self.grid_red)
            alpha = compute_alpha(x0_extra)

        # ── SO(2) conv 2 ──────────────────────────────────────────────────
        msg, _ = SO2Conv(
            layout=self.layout_red,
            in_channels=self.hidden_channels,
            out_channels=self.num_heads * self.attn_value_channels,
            extra_m0=0,
            rad_channels=None,
            tp="row",
            name="so2_conv_2",
        )(msg, None)

        # ── alpha-weighted aggregation ────────────────────────────────────
        if self.alpha_drop > 0.0:
            alpha = nn.Dropout(rate=self.alpha_drop)(
                alpha, deterministic=deterministic
            )
        E, Kr = msg.shape[0], msg.shape[1]
        msg = msg.reshape(E, Kr, self.num_heads, self.attn_value_channels)
        msg = msg * alpha[:, None, :, None].astype(msg.dtype)
        msg = msg.reshape(E, Kr, self.num_heads * self.attn_value_channels)

        # ── rotate back + reduce ──────────────────────────────────────────
        msg = rotate_from_edge(wigner, msg, self.layout_red)
        agg = segment_sum(
            msg, edge_dst, num_segments=num_nodes, mask=edge_mask,
            sorted_ids=True, blocks=self.blocks, fixed_dst=True,
        )

        # ── output projection ─────────────────────────────────────────────
        return SO3Linear(
            in_features=self.num_heads * self.attn_value_channels,
            out_features=self.output_channels,
            lmax=lmax,
            tp="row",
            name="proj",
        )(agg)
