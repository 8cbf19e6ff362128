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

from .layers import Dense, fan_in_normal

__all__ = ["HTR", "GATAValueActivation"]


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
            # vector rejection of the edge-direction component
            qi = qi - jnp.sum(qi * rl, axis=1, keepdims=True) * rl
            kj = kj - jnp.sum(kj * (-rl), axis=1, keepdims=True) * (-rl)
            w_ij = w_ij + jnp.sum(qi * kj, axis=1) / d

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

        bias = Dense(S * C, name="W_rs")(t_ij) * jax.nn.silu(
            Dense(S * C, name="gamma_s")(h_j)
        )
        if self.use_phi:
            bias = bias * Dense(S * C, name="phi_proj")(phi_r)
        combined = attn_output + bias  # [E, S*C]

        o_s = combined[:, :C]
        out_scalar = jax.nn.silu(o_s)[:, None, :]  # [E, 1, C]

        Xp = Dense(C, use_bias=False, name="xj_proj")(X_j)  # [E, K-1, C]

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
