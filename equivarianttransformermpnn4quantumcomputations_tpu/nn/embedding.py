"""Input embeddings: edge-degree structure embedding.

Re-design of reference ``EdgeDegreeEmbedding``
(models/EquiformerV2Functions/input_block.py:17-131): an invariant radial MLP
emits the m = 0 coefficients in the edge frame, the other orders are zero,
the result is rotated back to the global frame with the inverse Wigner
matrices and scatter-summed onto target nodes, scaled by 1/avg_degree.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.irreps import IrrepsLayout
from ..ops.rotation import WignerBlocks, rotate_from_edge
from ..ops.segment import segment_sum
from .attention import _atom_edge_embedding_init
from .layers import RadialMLP

__all__ = ["EdgeDegreeEmbedding"]


class EdgeDegreeEmbedding(nn.Module):
    sphere_channels: int
    layout_red: IrrepsLayout
    max_num_elements: int
    edge_channels_list: Sequence[int]
    use_atom_edge_embedding: bool
    rescale_factor: float
    blocks: tuple | None = None   # (B, n_max, e_max) graph-uniform layout

    @nn.compact
    def __call__(
        self,
        atomic_numbers,
        edge_scalars,
        edge_src,
        edge_dst,
        edge_mask,
        wigner: WignerBlocks,
        num_nodes: int,
    ):
        lay = self.layout_red
        ec = list(self.edge_channels_list)
        if self.use_atom_edge_embedding:
            src_emb = nn.Embed(
                self.max_num_elements, ec[-1],
                embedding_init=_atom_edge_embedding_init,
            )(atomic_numbers[edge_src])
            dst_emb = nn.Embed(
                self.max_num_elements, ec[-1],
                embedding_init=_atom_edge_embedding_init,
            )(atomic_numbers[edge_dst])
            x_edge = jnp.concatenate([edge_scalars, src_emb, dst_emb], axis=1)
            ec[0] = ec[0] + 2 * ec[-1]
        else:
            x_edge = edge_scalars

        L0 = int(lay.m_size[0])  # lmax + 1 coefficients at m = 0
        r = RadialMLP(tuple(ec) + (L0 * self.sphere_channels,))(x_edge)
        m0 = r.reshape(-1, L0, self.sphere_channels)

        # place the m=0 block into the reduced m-primary layout, rest zero,
        # then convert to l-primary via the static permutation
        E = m0.shape[0]
        zeros = jnp.zeros(
            (E, lay.num_coefficients - L0, self.sphere_channels), dtype=m0.dtype
        )
        xm = jnp.concatenate([m0, zeros], axis=1)
        x_edge_emb = xm[:, lay.from_m_perm, :]

        x_edge_emb = rotate_from_edge(wigner, x_edge_emb, lay)
        out = segment_sum(
            x_edge_emb, edge_dst, num_segments=num_nodes, mask=edge_mask,
            sorted_ids=True, blocks=self.blocks, fixed_dst=True,
        )
        return out / self.rescale_factor
