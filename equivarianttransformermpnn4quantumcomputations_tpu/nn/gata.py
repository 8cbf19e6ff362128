"""GATA components: HTR edge-stream refinement and the GATA value activation.

Re-designs of the reference GotenNet-inspired variant library
(models/NewFunctions/Gotennet_morethaninspired/activation.py:166-414 and the
phi-every-layer fork Gotennets_GATA_phi_refined_every_layer/activation.py:352).

``t_ij`` is a per-edge invariant feature stream threaded through all blocks;
HTR refines it each layer from inner products of the steerable node features
with the edge-direction component rejected; the value activation turns it into
per-degree gates o_s / o_d^(l) / o_t^(l) applied to the edge direction SH and
the neighbour's steerable features (paper Eqs. 6-7 as realized in the
reference).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Dense, fan_in_normal, tp_dense

__all__ = ["HTR", "GATAValueActivation", "gata_value_activation_v1"]


def gata_value_activation_v1(gates, X_j, rl_ij, lmax: int, hidden_channels: int):
    """GATA **v1** value activation (parameter-free).

    Reference models/NewFunctions/Gotennet_inspired/activation.py:168-245 —
    the original GotenNet-*inspired* fork used by
    equiformerv2_MatPES_GATA.py:35.  Differences from V2
    (:class:`GATAValueActivation`):

    * no ``t_ij`` stream / HTR and no ``W_rs(t_ij) * gamma_s(h_j)`` bias —
      the gates o_s / o_d^(l) / o_t^(l) come straight from so2_conv_1's
      extra m=0 output;
    * ``X_j`` is used **unprojected** (requires
      ``hidden_channels == sphere_channels``, as in the reference config
      where attn_hidden_channels == sphere_channels == 128);
    * the output keeps the FULL (lmax+1)^2 coefficient width — no mmax
      clipping — so the model must run with ``mmax == lmax`` (the reference
      config comment 'mmax_list: [4]  # was 2...' records exactly this
      constraint, configs/MatPES/config_cosinelearningGATA.py:110);
    * alpha is applied the *baseline* way (per-head weights after
      so2_conv_2), not as a head-mean scale of the gates.

    gates: [E, (1+2*lmax)*C]; X_j: [E, K_full-1, C] unrotated;
    rl_ij: [E, K_full-1].  Returns [E, K_full, C].
    """
    C = hidden_channels
    rl_ij = rl_ij.astype(gates.dtype)
    out = [jax.nn.silu(gates[:, :C])[:, None, :]]
    offset = 0
    for l in range(1, lmax + 1):
        d = 2 * l + 1
        rl = rl_ij[:, offset : offset + d][..., None]       # [E, d, 1]
        Xl = X_j[:, offset : offset + d, :]                 # [E, d, C]
        offset += d
        od = gates[:, (1 + (l - 1)) * C : (1 + l) * C][:, None, :]
        ot = gates[
            :, (1 + lmax + (l - 1)) * C : (1 + lmax + l) * C
        ][:, None, :]
        out.append(od * rl + ot * Xl)
    return jnp.concatenate(out, axis=1)


def _xavier_uniform():
    return nn.initializers.xavier_uniform()


class HTR(nn.Module):
    """Hierarchical Tensor Refinement of the invariant edge stream t_ij.

    Reference Gotennet_morethaninspired/activation.py:166-264.

        w_ij   = sum_l < rej(W_vq X_i^(l), +r) , rej(W_vk^(l) X_j^(l), -r) > / (2l+1)
        t_ij  += gamma_w(w_ij) * gamma_t(t_ij)

    where rej(v, r) removes the component of v along the edge-direction SH r.
    """

    sphere_channels: int
    edge_channels: int
    lmax: int
    hidden_channels: int | None = None

    @nn.compact
    def __call__(self, t_ij, X_i, X_j, rl_ij):
        """t_ij [E, edge_C]; X_i/X_j [E, K-1, sphere_C]; rl_ij [E, K-1]."""
        hidden = self.hidden_channels or self.edge_channels
        rl_ij = rl_ij.astype(X_i.dtype)

        q = Dense(hidden, use_bias=False, name="W_vq")(X_i)  # [E, K-1, H]

        w_ij = jnp.zeros(
            (t_ij.shape[0], hidden), dtype=t_ij.dtype
        )
        offset = 0
        for l in range(1, self.lmax + 1):
            d = 2 * l + 1
            sl = slice(offset, offset + d)
            offset += d
            rl = rl_ij[:, sl][..., None]              # [E, d, 1]
            qi = q[:, sl, :]
            kj = Dense(hidden, use_bias=False, name=f"W_vk_{l}")(X_j[:, sl, :])
            # vector rejection of the edge-direction component on both
            # sides.  rej(v, r) = rej(v, -r) = (I - r r^T) v is one
            # symmetric matrix P with P^2 = I - (2 - s) r r^T, s = |r|^2, so
            #   < P qi, P kj > = < qi, kj > - (2 - s) < qi, rl > < kj, rl >
            # — algebraically identical to the reference's materialized
            # rejections (activation.py:220-224) but with three coefficient
            # reductions and ZERO [E, d, H] intermediates (the rejected
            # tensors were ~40% of this block's HBM traffic and its AD
            # residuals)
            qk = jnp.sum(qi * kj, axis=1)             # [E, H]
            qr = jnp.sum(qi * rl, axis=1)             # [E, H]
            kr = jnp.sum(kj * rl, axis=1)             # [E, H]
            s = jnp.sum(rl * rl, axis=1)              # [E, 1]
            w_ij = w_ij + (qk - (2.0 - s) * qr * kr) / d

        gw = jax.nn.silu(
            Dense(self.edge_channels, kernel_init=_xavier_uniform(), name="gamma_w")(w_ij)
        )
        gt = jax.nn.silu(
            Dense(self.edge_channels, name="gamma_t_1")(t_ij)
        )
        gt = jax.nn.silu(Dense(self.edge_channels, name="gamma_t_2")(gt))
        return t_ij + gw * gt


class GATAValueActivation(nn.Module):
    """Replace the separable-S2 value activation with GATA gating (Eqs. 6-7).

    Reference Gotennet_morethaninspired/activation.py:270-414 (+ the
    phi-every-layer bias, Gotennets_GATA_phi_refined_every_layer/activation.py:352).

    Inputs:
        attn_output [E, S*C] with S = 1 + 2*lmax  (extra m=0 from so2_conv_1)
        t_ij [E, edge_C], h_j [E, sphere_C], X_j [E, K-1, sphere_C] (unrotated),
        rl_ij [E, K-1], optional phi_r [E, num_rbf].
    Output: [E, K_red, C] in the *reduced* layout, written from unrotated-frame
        quantities — faithful to the reference quirk of feeding unrotated
        ``o_d * rl + o_t * X_j`` into the rotated mmax-clipped value path
        (activation.py:388-409; see SURVEY "equivariance-faithfulness").
    """

    sphere_channels: int
    hidden_channels: int
    edge_channels: int
    lmax: int
    mmax: int
    use_phi: bool = False
    num_rbf: int = 0

    @nn.compact
    def __call__(self, attn_output, t_ij, h_j, X_j, rl_ij, phi_r=None):
        C = self.hidden_channels
        S = 1 + 2 * self.lmax
        rl_ij = rl_ij.astype(attn_output.dtype)

        bias = tp_dense(S * C, "col", name="W_rs")(t_ij) * jax.nn.silu(
            tp_dense(S * C, "col", name="gamma_s")(h_j)
        )
        if self.use_phi:
            bias = bias * Dense(S * C, name="phi_proj")(phi_r)
        combined = attn_output + bias  # [E, S*C]

        o_s = combined[:, :C]
        out_scalar = jax.nn.silu(o_s)[:, None, :]  # [E, 1, C]

        Xp = tp_dense(C, "col", use_bias=False, name="xj_proj")(X_j)  # [E, K-1, C]

        out_deg = []
        offset = 0
        for l in range(1, self.lmax + 1):
            d = 2 * l + 1
            m_width = min(d, 2 * self.mmax + 1)
            Xl = Xp[:, offset : offset + m_width, :]
            rl = rl_ij[:, offset : offset + m_width][..., None]
            offset += d
            od = combined[:, (1 + (l - 1)) * C : (1 + l) * C][:, None, :]
            ot = combined[
                :, (1 + self.lmax + (l - 1)) * C : (1 + self.lmax + l) * C
            ][:, None, :]
            out_deg.append(od * rl + ot * Xl)

        return jnp.concatenate([out_scalar] + out_deg, axis=1)
