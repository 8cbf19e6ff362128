"""Mixture-of-Experts FFN gated by the HTR edge context (MoE variant).

Re-designs of reference models/NewFunctions/GATA_and_all2all_MoE/
transformer_block.py:375-634 and the ..._BREAKING_EQUIVARIANCE fork
(:569-604, :978-1026):
* EquivariantExpertFFN: linear -> per-degree invariant context gates from c_i
  (SiLU on l=0 only) -> linear;
* NonEquivariantExpertFFN: SiLU applied to ALL coefficients (deliberate
  equivariance violation, ablation-only);
* MoEHTRFeedForward: soft softmax routing over K experts from c_i = mean of
  HTR-refined t_ij over incoming edges; routing entropy returned for
  utilization monitoring (reference :610-617).

Note on parallelism: this is a *dense* soft mixture — every expert runs on
every atom (reference semantics; SURVEY §2.6).  Experts are STACKED via
``nn.vmap`` (params carry a leading ``num_experts`` axis), so (a) the K
expert GEMMs batch into one MXU einsum instead of K separate launches, and
(b) the expert axis is expert-parallel shardable over a mesh axis
(parallel/sharding.py maps it to the ``model`` axis).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.segment import segment_mean
from .layers import Dense, tp_dense

__all__ = ["EquivariantExpertFFN", "NonEquivariantExpertFFN", "MoEHTRFeedForward"]


class EquivariantExpertFFN(nn.Module):
    sphere_channels: int
    hidden_channels: int
    edge_channels: int
    lmax: int

    @nn.compact
    def __call__(self, x, c_i):
        """x: [N, K, C]; c_i: [N, edge_C] -> [N, K, C]."""
        h = tp_dense(self.hidden_channels, None, use_bias=False,
                     name="linear_1")(x)
        gates = jax.nn.silu(
            tp_dense(
                self.hidden_channels * (self.lmax + 1), None,
                name="gate_proj",
            )(c_i)
        )
        out = []
        for l in range(self.lmax + 1):
            hl = h[:, l * l : l * l + 2 * l + 1, :]
            g = gates[:, l * self.hidden_channels : (l + 1) * self.hidden_channels]
            if l == 0:
                out.append(jax.nn.silu(hl) * g[:, None, :])
            else:
                out.append(hl * g[:, None, :])
        h = jnp.concatenate(out, axis=1)
        return tp_dense(self.sphere_channels, None, use_bias=False,
                        name="linear_2")(h)


class NonEquivariantExpertFFN(nn.Module):
    """Deliberately non-equivariant expert (ablation; reference :978-1026)."""

    sphere_channels: int
    hidden_channels: int
    edge_channels: int
    lmax: int

    @nn.compact
    def __call__(self, x, c_i):
        h = tp_dense(self.hidden_channels, None, name="linear_1")(x)
        h = jax.nn.silu(h)  # SiLU on every coefficient: breaks equivariance
        gate = jax.nn.silu(
            tp_dense(self.hidden_channels, None, name="gate_proj")(c_i)
        )
        h = h * gate[:, None, :]
        return tp_dense(self.sphere_channels, None, name="linear_2")(h)


class MoEHTRFeedForward(nn.Module):
    sphere_channels: int
    hidden_channels: int
    edge_channels: int
    lmax: int
    num_experts: int = 4
    breaking_equivariance: bool = False  # mixed equiv/non-equiv expert pool

    @nn.compact
    def __call__(self, x, t_ij, edge_dst, edge_mask, blocks=None):
        """x: [N, K, C]; t_ij: [E, edge_C] -> ([N, K, C], routing_entropy)."""
        N = x.shape[0]
        c_i = segment_mean(
            t_ij, edge_dst, num_segments=N, mask=edge_mask, blocks=blocks,
            fixed_dst=True,
        )
        c_i = jnp.nan_to_num(c_i, nan=0.0, posinf=1.0, neginf=-1.0)

        r = jax.nn.silu(Dense(self.edge_channels, name="router_1")(c_i))
        w = jax.nn.softmax(Dense(self.num_experts, name="router_2")(r), axis=-1)
        entropy = jnp.mean(
            -jnp.sum(w * jnp.log(w + 1e-8), axis=-1)
        )

        if self.breaking_equivariance:
            n_equiv = -(-self.num_experts // 2)
        else:
            n_equiv = self.num_experts
        n_nonequiv = self.num_experts - n_equiv

        kw = dict(
            sphere_channels=self.sphere_channels,
            hidden_channels=self.hidden_channels,
            edge_channels=self.edge_channels,
            lmax=self.lmax,
        )

        def stack(cls, size, name):
            """vmap over a leading expert axis: params [K_e, ...] (EP axis),
            inputs broadcast, outputs stacked [K_e, N, Kc, C]."""
            return nn.vmap(
                cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=None,
                out_axes=0,
                axis_size=size,
                # the stacked expert axis IS the EP axis: name it so
                # parallel/sharding.py shards it over the mesh model axis
                metadata_params={nn.meta.PARTITION_NAME: "ep"},
            )(**kw, name=name)

        outs = stack(EquivariantExpertFFN, n_equiv, "experts_eq")(x, c_i)
        if n_nonequiv:
            outs_ne = stack(
                NonEquivariantExpertFFN, n_nonequiv, "experts_ne"
            )(x, c_i)
            outs = jnp.concatenate([outs, outs_ne], axis=0)
        # soft mixture: out[n] = sum_k w[n,k] * expert_k(x)[n]
        out = jnp.einsum("nk,knqc->nqc", w, outs)
        return out, entropy
