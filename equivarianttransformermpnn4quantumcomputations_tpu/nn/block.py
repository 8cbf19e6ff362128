"""Transformer block: pre-norm attention + FFN with equivariant dropout.

Re-design of reference ``TransBlockV2``
(models/EquiformerV2Functions/transformer_block.py:456-633) and the GATA fork
(NewFunctions/Gotennet_morethaninspired/transformer_block.py:471-663), unified:
when ``gata=True`` the block refines the ``t_ij`` edge stream with HTR before
attention and returns ``(x, t_ij)``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.irreps import IrrepsLayout
from ..ops.pallas.segsum import gather_nodes
from ..ops.rotation import WignerBlocks
from ..ops.s2grid import S2Grid
from .attention import GraphAttention
from .ffn import FeedForward
from .gata import HTR
from .norms import get_normalization_layer
from .so3_layers import SO3Linear

__all__ = ["TransBlock", "BlockScanBody", "GraphDropPath", "EquivariantDropout"]


class GraphDropPath(nn.Module):
    """Drop whole graphs from the residual branch (reference drop.py:49-68)."""

    rate: float

    @nn.compact
    def __call__(self, x, graph_idx, num_graphs: int, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (num_graphs,))
        m = mask[graph_idx].astype(x.dtype)
        return x * m.reshape(-1, *([1] * (x.ndim - 1))) / keep


class EquivariantDropout(nn.Module):
    """Channel dropout with one mask shared across the coefficient axis
    (reference drop.py:119-149) — masking whole channels preserves
    equivariance."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, x.shape[2]))
        return x * mask.astype(x.dtype) / keep


class TransBlock(nn.Module):
    layout_full: IrrepsLayout
    layout_red: IrrepsLayout
    grid_red: S2Grid
    grid_full: S2Grid
    sphere_channels: int
    attn_hidden_channels: int
    num_heads: int
    attn_alpha_channels: int
    attn_value_channels: int
    ffn_hidden_channels: int
    output_channels: int
    max_num_elements: int
    edge_channels_list: Sequence[int]
    use_atom_edge_embedding: bool = True
    use_m_share_rad: bool = False
    use_attn_renorm: bool = True
    use_gate_act: bool = False
    use_grid_mlp: bool = False
    use_sep_s2_act: bool = True
    norm_type: str = "rms_norm_sh"
    alpha_drop: float = 0.0
    drop_path_rate: float = 0.0
    proj_drop: float = 0.0
    # GATA
    gata: bool = False
    gata_v1: bool = False   # Gotennet_inspired fork: rl_ij only, no t_ij/HTR
    edge_channels: int = 0
    normalize_attn_output: bool = True
    use_phi_every_layer: bool = False
    num_rbf: int = 0
    # FFN variant: 'standard' | 'moe' | 'moe_breaking' | 'tensor_product'
    # | 'esen' (reference GATA_and_all2all_MoE / _Dual_Stream /
    # _escninsipred_envelope_and_simple_gating forks)
    ffn_variant: str = "standard"
    num_experts: int = 4
    # dual-stream: thread a second (angular) edge stream through the block
    dual_stream: bool = False
    # (B, n_max, e_max) graph-uniform layout for block-diagonal segment ops
    blocks: tuple | None = None
    # static per-construction context (attributes, not call args, so that the
    # whole block can be wrapped in nn.remat with pure-pytree call args)
    num_graphs: int = 1
    deterministic: bool = True

    @nn.compact
    def __call__(
        self,
        x,
        atomic_numbers,
        edge_scalars,
        edge_src,
        edge_dst,
        edge_mask,
        wigner: WignerBlocks,
        graph_idx,
        t_ij=None,
        rl_ij=None,
        phi_r=None,
        a_ij=None,
    ):
        num_graphs = self.num_graphs
        deterministic = self.deterministic
        lmax = self.layout_full.lmax

        if self.gata:
            # HTR refines the edge stream from the *current* features
            # (reference Gotennet fork transformer_block.py:595-613)
            X_i = gather_nodes(x, edge_src, blocks=self.blocks)[:, 1:, :]
            X_j = gather_nodes(x, edge_dst, blocks=self.blocks,
                               canonical_dst=True)[:, 1:, :]
            t_ij = HTR(
                sphere_channels=self.sphere_channels,
                edge_channels=self.edge_channels,
                lmax=lmax,
                name="htr",
            )(t_ij, X_i, X_j, rl_ij)
            if self.dual_stream:
                from .dual_stream import AngularHTR

                a_ij = AngularHTR(
                    sphere_channels=self.sphere_channels,
                    edge_channels=self.edge_channels,
                    lmax=lmax,
                    name="angular_htr",
                )(a_ij, t_ij, x, edge_src, edge_dst, edge_mask,
                  blocks=self.blocks)

        drop_path = GraphDropPath(self.drop_path_rate)
        proj_drop = EquivariantDropout(self.proj_drop)

        res = x
        h = get_normalization_layer(
            self.norm_type, lmax, self.sphere_channels
        )(x)
        h = GraphAttention(
            layout_full=self.layout_full,
            layout_red=self.layout_red,
            grid_red=self.grid_red,
            sphere_channels=self.sphere_channels,
            hidden_channels=self.attn_hidden_channels,
            num_heads=self.num_heads,
            attn_alpha_channels=self.attn_alpha_channels,
            attn_value_channels=self.attn_value_channels,
            output_channels=self.sphere_channels,
            max_num_elements=self.max_num_elements,
            edge_channels_list=self.edge_channels_list,
            use_atom_edge_embedding=self.use_atom_edge_embedding,
            use_m_share_rad=self.use_m_share_rad,
            use_attn_renorm=self.use_attn_renorm,
            use_gate_act=self.use_gate_act,
            use_sep_s2_act=self.use_sep_s2_act,
            alpha_drop=self.alpha_drop,
            gata=self.gata,
            gata_v1=self.gata_v1,
            blocks=self.blocks,
            edge_channels=self.edge_channels,
            normalize_attn_output=self.normalize_attn_output,
            use_phi_every_layer=self.use_phi_every_layer,
            num_rbf=self.num_rbf,
            name="ga",
        )(
            h,
            atomic_numbers,
            edge_scalars,
            edge_src,
            edge_dst,
            edge_mask,
            wigner,
            t_ij=t_ij,
            rl_ij=rl_ij,
            phi_r=phi_r,
            deterministic=deterministic,
        )
        h = drop_path(h, graph_idx, num_graphs, deterministic)
        h = proj_drop(h, deterministic)
        x = h + res

        res = x
        h = get_normalization_layer(
            self.norm_type, lmax, self.sphere_channels
        )(x)
        if self.ffn_variant in ("moe", "moe_breaking"):
            from .moe import MoEHTRFeedForward

            h, entropy = MoEHTRFeedForward(
                sphere_channels=self.sphere_channels,
                hidden_channels=self.ffn_hidden_channels,
                edge_channels=self.edge_channels,
                lmax=lmax,
                num_experts=self.num_experts,
                breaking_equivariance=(self.ffn_variant == "moe_breaking"),
                name="ffn",
            )(h, t_ij, edge_dst, edge_mask, blocks=self.blocks)
            self.sow("intermediates", "routing_entropy", entropy)
        elif self.ffn_variant == "esen":
            from .ffn import ESENFeedForward

            h = ESENFeedForward(
                sphere_channels=self.sphere_channels,
                hidden_channels=self.ffn_hidden_channels,
                output_channels=self.output_channels,
                lmax=lmax,
                name="ffn",
            )(h)
        elif self.ffn_variant == "tensor_product":
            from .dual_stream import TensorProductFFN

            h = TensorProductFFN(
                sphere_channels=self.sphere_channels,
                hidden_channels=self.ffn_hidden_channels,
                edge_channels=self.edge_channels,
                lmax=lmax,
                name="ffn",
            )(h, t_ij, a_ij if a_ij is not None else t_ij, edge_dst,
              edge_mask, blocks=self.blocks)
        else:
            h = FeedForward(
                sphere_channels=self.sphere_channels,
                hidden_channels=self.ffn_hidden_channels,
                output_channels=self.output_channels,
                lmax=lmax,
                grid_full=self.grid_full,
                use_gate_act=self.use_gate_act,
                use_grid_mlp=self.use_grid_mlp,
                use_sep_s2_act=self.use_sep_s2_act,
                name="ffn",
            )(h)
        h = drop_path(h, graph_idx, num_graphs, deterministic)
        h = proj_drop(h, deterministic)

        if self.sphere_channels != self.output_channels:
            res = SO3Linear(
                self.sphere_channels,
                self.output_channels,
                lmax,
                name="ffn_shortcut",
            )(res)
        x = h + res

        if self.gata and self.dual_stream:
            return x, t_ij, a_ij
        if self.gata:
            return x, t_ij
        return x


class BlockScanBody(nn.Module):
    """Carry-protocol adapter around TransBlock for nn.scan over layers.

    carry = (x, t_ij, a_ij); broadcast = the per-batch edge context.  Wrapped
    with nn.remat *as a class* so the scan saves only block inputs as
    residuals (a closure-function remat leaves the scan storing every
    intra-block intermediate stacked over layers — observed as multi-GB
    [L, ...] buffers on TPU).
    """

    block_kwargs: tuple  # tuple(sorted(kwargs.items())) for TransBlock

    @nn.compact
    def __call__(self, carry, broadcast):
        x, t_ij, a_ij = carry
        (
            atomic_numbers, edge_scalars, edge_src, edge_dst, edge_mask,
            wigner, graph_idx, rl_ij, phi_r,
        ) = broadcast
        kw = dict(self.block_kwargs)
        out = TransBlock(**kw, name="block")(
            x, atomic_numbers, edge_scalars, edge_src, edge_dst, edge_mask,
            wigner, graph_idx, t_ij, rl_ij, phi_r, a_ij,
        )
        if kw.get("gata") and kw.get("dual_stream"):
            new_carry = out
        elif kw.get("gata"):
            new_carry = out + (a_ij,)
        else:
            new_carry = (out, t_ij, a_ij)
        # lax.scan requires a type-stable carry; un-cast params (f32) with a
        # bf16 compute dtype would otherwise promote the carry to f32
        new_carry = jax.tree_util.tree_map(
            lambda n, o: n.astype(o.dtype), new_carry, carry
        )
        return new_carry, None
