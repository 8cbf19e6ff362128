"""EquiformerV2 for OC20 S2EF: energy head + explicit per-atom force head.

Re-design of reference models/equiformerv2_oc20.py:63-306:
* energy: FFN head, graph-summed, divided by the OC20 average node count
  (reference :278-281, _AVG_NUM_NODES at :39);
* forces: one extra SO(2) graph-attention block with a single output channel;
  the Cartesian force is read off the l=1 coefficients (reference :284-287).
  In our z-primary real-SH basis the l=1 coefficients are ordered
  (m=-1,0,+1) ~ (y, z, x), so the Cartesian map is the static gather
  [+1, -1, 0] -> (x, y, z).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.attention import GraphAttention
from ..nn.ffn import FeedForward
from ..ops.irreps import layout as get_layout
from ..ops.s2grid import s2grid
from ..ops.segment import segment_sum
from .backbone import EquiformerV2Backbone

__all__ = ["EquiformerV2OC20"]

_AVG_NUM_NODES_OC20 = 77.81317
_AVG_DEGREE_OC20 = 23.395238876342773


class EquiformerV2OC20(nn.Module):
    regress_forces: bool = True
    num_layers: int = 12
    sphere_channels: int = 128
    attn_hidden_channels: int = 128
    num_heads: int = 8
    attn_alpha_channels: int = 32
    attn_value_channels: int = 16
    ffn_hidden_channels: int = 512
    lmax: int = 6
    mmax: int = 2
    grid_resolution: int | None = None
    edge_channels: int = 128
    num_rbf: int = 600
    max_num_elements: int = 90
    cutoff: float = 12.0
    norm_type: str = "rms_norm_sh"
    use_gate_act: bool = False
    use_grid_mlp: bool = False
    use_sep_s2_act: bool = True
    use_m_share_rad: bool = False
    use_attn_renorm: bool = True
    use_atom_edge_embedding: bool = True
    share_atom_edge_embedding: bool = False
    alpha_drop: float = 0.1
    drop_path_rate: float = 0.05
    proj_drop: float = 0.0
    avg_num_nodes: float = _AVG_NUM_NODES_OC20
    avg_degree: float = _AVG_DEGREE_OC20
    remat: bool = False
    scan_layers: bool = False
    uniform_blocks: bool = False
    fixed_degree: bool = False
    # Wigner representation (construction-time; 'auto' = flags/platform)
    wigner_rep: str = "auto"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, batch: dict, deterministic: bool = True):
        out = EquiformerV2Backbone(
            num_layers=self.num_layers,
            sphere_channels=self.sphere_channels,
            attn_hidden_channels=self.attn_hidden_channels,
            num_heads=self.num_heads,
            attn_alpha_channels=self.attn_alpha_channels,
            attn_value_channels=self.attn_value_channels,
            ffn_hidden_channels=self.ffn_hidden_channels,
            lmax=self.lmax,
            mmax=self.mmax,
            grid_resolution=self.grid_resolution,
            edge_channels=self.edge_channels,
            num_rbf=self.num_rbf,
            max_num_elements=self.max_num_elements,
            cutoff=self.cutoff,
            norm_type=self.norm_type,
            use_gate_act=self.use_gate_act,
            use_grid_mlp=self.use_grid_mlp,
            use_sep_s2_act=self.use_sep_s2_act,
            use_m_share_rad=self.use_m_share_rad,
            use_attn_renorm=self.use_attn_renorm,
            use_atom_edge_embedding=self.use_atom_edge_embedding,
            share_atom_edge_embedding=self.share_atom_edge_embedding,
            alpha_drop=self.alpha_drop,
            drop_path_rate=self.drop_path_rate,
            proj_drop=self.proj_drop,
            avg_degree=self.avg_degree,
            remat=self.remat,
            scan_layers=self.scan_layers,
            uniform_blocks=self.uniform_blocks,
            fixed_degree=self.fixed_degree,
            wigner_rep=self.wigner_rep,
            compute_dtype=self.compute_dtype,
            name="backbone",
        )(
            batch["atomic_numbers"],
            batch["pos"],
            batch["graph_idx"],
            batch["edge_src"],
            batch["edge_dst"],
            batch["edge_shift"],
            batch["edge_mask"],
            batch["cell"],
            deterministic=deterministic,
        )

        grid_full = s2grid(self.lmax, self.lmax, self.grid_resolution)
        node_energy = FeedForward(
            sphere_channels=self.sphere_channels,
            hidden_channels=self.ffn_hidden_channels,
            output_channels=1,
            lmax=self.lmax,
            grid_full=grid_full,
            use_gate_act=self.use_gate_act,
            use_grid_mlp=self.use_grid_mlp,
            use_sep_s2_act=self.use_sep_s2_act,
            name="energy_block",
        )(out.x)[:, 0, 0]
        num_graphs = batch["cell"].shape[0]
        energy = (
            segment_sum(
                node_energy,
                batch["graph_idx"],
                num_segments=num_graphs,
                mask=batch["node_mask"],
            )
            / self.avg_num_nodes
        )
        result = {"energy": energy}

        if self.regress_forces:
            lay_red = get_layout(self.lmax, self.mmax)
            grid_red = s2grid(self.lmax, self.mmax, self.grid_resolution)
            f = GraphAttention(
                layout_full=get_layout(self.lmax, self.lmax),
                layout_red=lay_red,
                grid_red=grid_red,
                sphere_channels=self.sphere_channels,
                hidden_channels=self.attn_hidden_channels,
                num_heads=self.num_heads,
                attn_alpha_channels=self.attn_alpha_channels,
                attn_value_channels=self.attn_value_channels,
                output_channels=1,
                max_num_elements=self.max_num_elements,
                edge_channels_list=(
                    self.num_rbf, self.edge_channels, self.edge_channels
                ),
                use_atom_edge_embedding=self.use_atom_edge_embedding
                and not self.share_atom_edge_embedding,
                use_m_share_rad=self.use_m_share_rad,
                use_attn_renorm=self.use_attn_renorm,
                use_gate_act=self.use_gate_act,
                use_sep_s2_act=self.use_sep_s2_act,
                alpha_drop=self.alpha_drop,
                name="force_block",
            )(
                out.x,
                batch["atomic_numbers"],
                out.edge_scalars,
                batch["edge_src"],
                batch["edge_dst"],
                batch["edge_mask"],
                out.wigner,
                deterministic=deterministic,
            )
            # l=1 coefficients (m=-1,0,+1) ~ (y, z, x) -> Cartesian (x, y, z)
            forces = f[:, (3, 1, 2), 0]
            result["forces"] = forces * batch["node_mask"][:, None].astype(
                forces.dtype
            )
        return result
