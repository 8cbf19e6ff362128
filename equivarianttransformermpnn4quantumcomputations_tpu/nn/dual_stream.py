"""Dual-stream variant: three-body angular edge stream + tensor-product FFN.

Re-designs of reference models/NewFunctions/GATA_and_all2all_Dual_Stream/
(activation.py:1363-1484 AngularHTR; transformer_block.py:375-460
TensorProductFFN).  Two invariant edge streams are threaded through the
blocks: ``t_ij`` (pairwise, HTR-refined) and ``a_ij`` (angular, three-body).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pallas.segsum import gather_nodes
from ..ops.segment import segment_mean, segment_sum
from .layers import Dense
from .norms import EquivariantRMSNormSH

__all__ = ["AngularHTR", "TensorProductFFN"]


class AngularHTR(nn.Module):
    """Three-body refinement of the angular stream a_ij.

    For edge (i -> j): aggregate degree-wise inner products between the
    (projected) j-features and the mean of all neighbour features scattered
    at the source node i, gate with t_ij, and residually update a_ij
    (reference activation.py:1363-1484 — including its quirk of projecting
    the *destination* features for both query and key sides).
    """

    sphere_channels: int
    edge_channels: int
    lmax: int

    @nn.compact
    def __call__(self, a_ij, t_ij, x, edge_src, edge_dst, edge_mask,
                 blocks=None):
        """a_ij/t_ij: [E, edge_C]; x: [N, K, C] (full embedding)."""
        N = x.shape[0]
        E = a_ij.shape[0]

        x = EquivariantRMSNormSH(
            lmax=self.lmax, num_channels=self.sphere_channels, name="x_norm"
        )(x)
        X_all = x[:, 1:, :]
        t_n = nn.LayerNorm(epsilon=1e-5, name="t_norm")(t_ij)

        # per-source mean degree (guard NaN; reference :1433-1436)
        ones = jnp.ones(E, dtype=a_ij.dtype)
        deg = jnp.maximum(
            segment_sum(ones, edge_src, num_segments=N, mask=edge_mask), 1.0
        )  # 1-D: blocks n/a

        w_ang = jnp.zeros((E, self.edge_channels), dtype=a_ij.dtype)
        offset = 0
        for l in range(1, self.lmax + 1):
            d = 2 * l + 1
            Xl = X_all[:, offset : offset + d, :]
            offset += d
            Xl_dst = gather_nodes(Xl, edge_dst, blocks=blocks,
                                  canonical_dst=True)
            Xj_q = Dense(self.edge_channels, use_bias=False, name=f"W_q_{l}")(
                Xl_dst
            )
            Xj_k = Dense(self.edge_channels, use_bias=False, name=f"W_k_{l}")(
                Xl_dst
            )
            agg_k = segment_sum(
                Xj_k, edge_src, num_segments=N, mask=edge_mask, blocks=blocks
            ) / deg[:, None, None]
            ip = jnp.sum(
                Xj_q * gather_nodes(agg_k, edge_src, blocks=blocks), axis=1
            )
            w_ang = w_ang + ip / d

        w_ang = w_ang * Dense(
            self.edge_channels, use_bias=False, name="t_proj"
        )(t_n)

        gw = jax.nn.silu(Dense(self.edge_channels, name="gamma_w")(w_ang))
        ga = jax.nn.silu(Dense(self.edge_channels, name="gamma_a_1")(a_ij))
        ga = jax.nn.silu(Dense(self.edge_channels, name="gamma_a_2")(ga))
        return a_ij + gw * ga


class TensorProductFFN(nn.Module):
    """FFN whose per-degree gates see [c_i, c_i_angular, ||X^(l)||, x0]
    (reference transformer_block.py:375-460)."""

    sphere_channels: int
    hidden_channels: int
    edge_channels: int
    lmax: int

    @nn.compact
    def __call__(self, x, t_ij, a_ij, edge_dst, edge_mask, blocks=None):
        N = x.shape[0]
        c_i = segment_mean(
            t_ij, edge_dst, num_segments=N, mask=edge_mask, blocks=blocks,
            fixed_dst=True,
        )
        c_a = segment_mean(
            a_ij, edge_dst, num_segments=N, mask=edge_mask, blocks=blocks,
            fixed_dst=True,
        )
        c_i = jnp.nan_to_num(c_i, nan=0.0, posinf=1.0, neginf=-1.0)
        c_a = jnp.nan_to_num(c_a, nan=0.0, posinf=1.0, neginf=-1.0)

        x0 = x[:, 0, :]
        h = Dense(self.hidden_channels, use_bias=False, name="linear_1")(x)
        out = []
        for l in range(self.lmax + 1):
            sl = slice(l * l, l * l + 2 * l + 1)
            feat_l = x[:, sl, :]
            norm_l = jnp.sqrt(jnp.maximum(jnp.sum(feat_l * feat_l, 1), 1e-12))
            gate_in = jnp.concatenate([c_i, c_a, norm_l, x0], axis=-1)
            g = jax.nn.silu(
                Dense(self.hidden_channels, name=f"gate_{l}_1")(gate_in)
            )
            g = jax.nn.silu(Dense(self.hidden_channels, name=f"gate_{l}_2")(g))
            hl = h[:, sl, :]
            if l == 0:
                out.append(jax.nn.silu(hl) * g[:, None, :])
            else:
                out.append(hl * g[:, None, :])
        h = jnp.concatenate(out, axis=1)
        return Dense(self.sphere_channels, use_bias=False, name="linear_2")(h)
