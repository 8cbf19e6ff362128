"""Equivariant normalization layers over [N, (lmax+1)^2, C] features.

Re-designs of reference models/EquiformerV2Functions/layer_norm.py:16-352.
All norms run in float32 regardless of the compute dtype — the reference
forces the same via ``@torch.cuda.amp.autocast(enabled=False)``
(layer_norm.py:63,155,230,313); under bf16 mixed precision the variance
accumulations are the numerically fragile part.

Instead of the reference's per-degree slicing loops, the per-degree affine
weights are expanded to the full coefficient axis with a static gather and
applied in one fused elementwise pass.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = [
    "EquivariantLayerNorm",
    "EquivariantLayerNormSH",
    "EquivariantRMSNormSH",
    "get_normalization_layer",
]


def _expand_index(lmax: int) -> np.ndarray:
    return np.concatenate([np.full(2 * l + 1, l) for l in range(lmax + 1)])


def _balance_weight(lmax: int, skip_l0: bool) -> np.ndarray:
    """Per-coefficient weight averaging component power uniformly per degree."""
    lmin = 1 if skip_l0 else 0
    parts = [
        np.full(2 * l + 1, 1.0 / (2 * l + 1)) for l in range(lmin, lmax + 1)
    ]
    w = np.concatenate(parts)
    return w / (lmax + 1 - lmin)


class EquivariantLayerNorm(nn.Module):
    """Per-degree layer norm ('layer_norm'; reference layer_norm.py:38-108)."""

    lmax: int
    num_channels: int
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x = x.astype(jnp.float32)
        out = []
        weight = (
            self.param(
                "weight",
                nn.initializers.ones,
                (self.lmax + 1, self.num_channels),
            )
            if self.affine
            else None
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.num_channels,))
            if self.affine
            else None
        )
        for l in range(self.lmax + 1):
            f = x[:, l * l : l * l + 2 * l + 1, :]
            if l == 0:
                f = f - jnp.mean(f, axis=2, keepdims=True)
            var = jnp.mean(f * f, axis=(1, 2), keepdims=True)
            f = f * (var + self.eps) ** -0.5
            if weight is not None:
                f = f * weight[l][None, None, :]
            if l == 0 and bias is not None:
                f = f + bias[None, None, :]
            out.append(f)
        return jnp.concatenate(out, axis=1).astype(dtype)


class EquivariantLayerNormSH(nn.Module):
    """'layer_norm_sh': LN on l=0; joint degree-balanced scaling on l>0
    (reference layer_norm.py:112-201)."""

    lmax: int
    num_channels: int
    eps: float = 1e-5
    affine: bool = True
    std_balance_degrees: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x = x.astype(jnp.float32)
        l0 = nn.LayerNorm(epsilon=self.eps, use_bias=self.affine, use_scale=self.affine)(
            x[:, :1, :]
        )
        if self.lmax == 0:
            return l0.astype(dtype)
        rest = x[:, 1:, :]
        if self.std_balance_degrees:
            bw = jnp.asarray(
                _balance_weight(self.lmax, skip_l0=True), dtype=jnp.float32
            )
            norm = jnp.einsum("nic,i->nc", rest * rest, bw)[:, None, :]
        else:
            norm = jnp.mean(rest * rest, axis=1, keepdims=True)
        norm = jnp.mean(norm, axis=2, keepdims=True)
        scale = (norm + self.eps) ** -0.5
        if self.affine:
            w = self.param(
                "weight", nn.initializers.ones, (self.lmax, self.num_channels)
            )
            wk = w[_expand_index(self.lmax)[1:] - 1]  # [K-1, C]
            scale = scale * wk[None]
        return jnp.concatenate([l0, rest * scale], axis=1).astype(dtype)


class EquivariantRMSNormSH(nn.Module):
    """'rms_norm_sh' (V2): joint RMS over all degrees, centering on l=0,
    degree-balanced std, per-degree affine (reference layer_norm.py:265-351)."""

    lmax: int
    num_channels: int
    eps: float = 1e-5
    affine: bool = True
    centering: bool = True
    std_balance_degrees: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x = x.astype(jnp.float32)
        if self.centering:
            l0 = x[:, :1, :]
            l0 = l0 - jnp.mean(l0, axis=2, keepdims=True)
            x = jnp.concatenate([l0, x[:, 1:, :]], axis=1)

        if self.std_balance_degrees:
            bw = jnp.asarray(
                _balance_weight(self.lmax, skip_l0=False), dtype=jnp.float32
            )
            norm = jnp.einsum("nic,i->nc", x * x, bw)[:, None, :]
        else:
            norm = jnp.mean(x * x, axis=1, keepdims=True)
        norm = jnp.mean(norm, axis=2, keepdims=True)
        scale = (norm + self.eps) ** -0.5

        if self.affine:
            w = self.param(
                "weight",
                nn.initializers.ones,
                (self.lmax + 1, self.num_channels),
            )
            wk = w[_expand_index(self.lmax)]  # [K, C]
            scale = scale * wk[None]
        out = x * scale
        if self.affine and self.centering:
            b = self.param(
                "bias", nn.initializers.zeros, (self.num_channels,)
            )
            out = out.at[:, 0, :].add(b)
        return out.astype(dtype)


def get_normalization_layer(norm_type: str, lmax: int, num_channels: int):
    if norm_type == "layer_norm":
        return EquivariantLayerNorm(lmax=lmax, num_channels=num_channels)
    if norm_type == "layer_norm_sh":
        return EquivariantLayerNormSH(lmax=lmax, num_channels=num_channels)
    if norm_type == "rms_norm_sh":
        return EquivariantRMSNormSH(lmax=lmax, num_channels=num_channels)
    raise ValueError(norm_type)


class EquivariantDegreeLayerScale(nn.Module):
    """CaiT-style per-degree layer scale: init 1 for l=0, 1/sqrt(2 l) scaled
    down for l>0 (reference layer_norm.py:354-380 — which has a latent
    missing-``math``-import bug; fixed here, and unused by the reference's
    models, kept for parity)."""

    lmax: int
    num_channels: int
    scale_factor: float = 2.0

    @nn.compact
    def __call__(self, x):
        def init(key, shape):
            w = np.ones(shape, dtype=np.float32)
            for l in range(1, self.lmax + 1):
                w[l] /= np.sqrt(self.scale_factor * l)
            return jnp.asarray(w)

        w = self.param("weight", init, (self.lmax + 1, self.num_channels))
        return x * w[_expand_index(self.lmax)][None]
