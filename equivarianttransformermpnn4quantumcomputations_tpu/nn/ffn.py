"""Equivariant feed-forward network.

Re-design of reference ``FeedForwardNetwork``
(models/EquiformerV2Functions/transformer_block.py:339-453): SO3 linear ->
{separable-S2 | gate | grid-MLP} activation -> SO3 linear, operating on full
(mmax = lmax) features.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.s2grid import S2Grid
from .activations import gate_activation, s2_activation, separable_s2_activation
from .layers import Dense, scaled_silu, tp_dense
from .partition import partitioned, role_names
from .so3_layers import SO3Linear

__all__ = ["FeedForward", "ESENFeedForward"]


class ESENFeedForward(nn.Module):
    """eSEN-style FFN: gated nonlinearity directly in SH space — no grid.

    Re-design of the reference 'envelope and simple gating' fork's
    FeedForwardNetwork (models/NewFunctions/GATA_and_all2all_escninsipred_
    envelope_and_simple_gating_toreplace_S2activation/transformer_block.py:
    369-475; its activation.py:93-133 deletes the S2 classes).  Despite the
    directory name there is no envelope anywhere in that fork — its only
    change is this FFN:

        SO3Linear (expand) ->
          l=0: ScaledSiLU;
          l>0: x^(l) * sigmoid(gate_proj_l(ScaledSiLU(x^(0))))
        -> SO3Linear (contract)

    Gate projections init to weight=0 / bias=2.0 so sigmoid(2) ~ 0.88 —
    gates start nearly open (reference :436-439).  Exactly equivariant:
    gates are invariant scalars shared across m within each l.
    """

    sphere_channels: int
    hidden_channels: int
    output_channels: int
    lmax: int

    @nn.compact
    def __call__(self, x):
        h = SO3Linear(
            self.sphere_channels, self.hidden_channels, self.lmax,
            tp="col", name="so3_linear_1",
        )(x)
        out_scalar = scaled_silu(h[:, :1, :])          # [N, 1, H]
        scalar_summary = out_scalar[:, 0, :]
        out = [out_scalar]
        for l in range(1, self.lmax + 1):
            gate = jax.nn.sigmoid(
                Dense(
                    self.hidden_channels,
                    kernel_init=partitioned(
                        nn.initializers.zeros, role_names(2, "col")
                    ),
                    bias_init=partitioned(
                        nn.initializers.constant(2.0), role_names(1, "col")
                    ),
                    name=f"gate_proj_{l}",
                )(scalar_summary)
            )
            sl = slice(l * l, l * l + 2 * l + 1)
            out.append(h[:, sl, :] * gate[:, None, :])
        h = jnp.concatenate(out, axis=1)
        return SO3Linear(
            self.hidden_channels, self.output_channels, self.lmax,
            tp="row", name="so3_linear_2",
        )(h)


class FeedForward(nn.Module):
    sphere_channels: int
    hidden_channels: int
    output_channels: int
    lmax: int
    grid_full: S2Grid  # grid at (lmax, lmax)
    use_gate_act: bool = False
    use_grid_mlp: bool = False
    use_sep_s2_act: bool = True

    @nn.compact
    def __call__(self, x):
        """x: [N, K_full, C] -> [N, K_full, output_channels]."""
        gating = None
        if self.use_grid_mlp:
            if self.use_sep_s2_act:
                gating = jax.nn.silu(
                    tp_dense(self.hidden_channels, "col",
                             name="scalar_mlp")(x[:, 0, :])
                )
        else:
            if self.use_gate_act:
                gating = tp_dense(
                    self.lmax * self.hidden_channels, "col",
                    name="gating_linear",
                )(x[:, 0, :])
            elif self.use_sep_s2_act:
                gating = tp_dense(
                    self.hidden_channels, "col", name="gating_linear"
                )(x[:, 0, :])

        h = SO3Linear(
            self.sphere_channels, self.hidden_channels, self.lmax,
            tp="col", name="so3_linear_1",
        )(x)

        if self.use_grid_mlp:
            g = self.grid_full.to_grid(h)
            for i in range(3):
                g = tp_dense(
                    self.hidden_channels, "row" if i == 1 else "col",
                    use_bias=False, name=f"grid_mlp_{i}",
                )(g)
                if i < 2:
                    g = jax.nn.silu(g)
            h = self.grid_full.from_grid(g)
            if self.use_sep_s2_act:
                h = jnp.concatenate([gating[:, None, :], h[:, 1:, :]], axis=1)
        else:
            if self.use_gate_act:
                h = gate_activation(
                    gating, h, self.lmax, self.lmax, self.hidden_channels
                )
            elif self.use_sep_s2_act:
                h = separable_s2_activation(gating, h, self.grid_full)
            else:
                h = s2_activation(h, self.grid_full)

        return SO3Linear(
            self.hidden_channels, self.output_channels, self.lmax,
            tp="row", name="so3_linear_2",
        )(h)
