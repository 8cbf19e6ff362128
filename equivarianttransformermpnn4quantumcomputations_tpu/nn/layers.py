"""Basic layers: initializers, radial MLP, distance smearing, scalar acts.

Initialization matches the reference's *effective* init after its global
``apply(self._init_weights)`` pass (reference equiformerv2_qm9.py:712-734):
every ``nn.Linear`` ends up ``normal(0, 1/sqrt(fan_in))`` with zero bias
(including the SO(2) complex pair weights, whose constructor-time 1/sqrt(2)
scaling is overwritten by that pass), and radial-function linears are then
re-initialized ``uniform(+-1/sqrt(fan_in))``
(``_uniform_init_rad_func_linear_weights``).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fan_in_normal",
    "fan_in_uniform",
    "Dense",
    "RadialMLP",
    "GaussianSmearing",
    "scaled_silu",
    "smooth_leaky_relu",
    "scaled_smooth_leaky_relu",
    "scaled_sigmoid",
    "swiglu",
]

_SCALED_SILU = 1.6791767923989418
_SCALED_SLRELU = 1.531320475574866
_SCALED_SIGMOID = 1.8467055342154763


def fan_in_normal():
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
        return jax.random.normal(key, shape, dtype) / math.sqrt(fan_in)

    return init


def fan_in_uniform():
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Dense):
    """nn.Dense with the reference's fan-in normal default init."""

    kernel_init: nn.initializers.Initializer = fan_in_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros


def tp_dense(features: int, tp: str | None, **kwargs) -> Dense:
    """``Dense`` carrying a tensor-parallel role annotation ('col'/'row')
    at the parameter definition (nn/partition.py) — sharding rules move
    with the module, not with its path name."""
    from .partition import partitioned, role_names

    return Dense(
        features,
        kernel_init=partitioned(fan_in_normal(), role_names(2, tp)),
        bias_init=partitioned(
            nn.initializers.zeros,
            role_names(1, "col" if tp == "col" else None),
        ),
        **kwargs,
    )


def scaled_silu(x):
    return jax.nn.silu(x) * _SCALED_SILU


def smooth_leaky_relu(x, negative_slope: float = 0.2):
    a = negative_slope
    return ((1 + a) / 2.0) * x + ((1 - a) / 2.0) * x * (
        2.0 * jax.nn.sigmoid(x) - 1.0
    )


def scaled_smooth_leaky_relu(x):
    return smooth_leaky_relu(x, 0.2) * _SCALED_SLRELU


def scaled_sigmoid(x):
    return jax.nn.sigmoid(x) * _SCALED_SIGMOID


def swiglu(x, w, out_channels: int, scaled: bool = False):
    w1 = w[..., :out_channels]
    w2 = w[..., out_channels:]
    act = scaled_silu(w1) if scaled else jax.nn.silu(w1)
    return act * w2


class RadialMLP(nn.Module):
    """(Linear -> LayerNorm -> SiLU)* -> Linear, uniform fan-in init.

    Reference: models/EquiformerV2Functions/radial_function.py:5-30.
    """

    channels: Sequence[int]  # [in, hidden..., out]

    @nn.compact
    def __call__(self, x):
        chs = list(self.channels)
        for i in range(1, len(chs)):
            x = nn.Dense(
                chs[i],
                kernel_init=fan_in_uniform(),
                bias_init=nn.initializers.zeros,
            )(x)
            if i < len(chs) - 1:
                # norm statistics always in f32 (cf. the reference's
                # fp32-forced norms under AMP)
                x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x).astype(x.dtype)
                x = jax.nn.silu(x)
        return x


class GaussianSmearing:
    """Gaussian RBF distance expansion (reference equiformerv2_oc20.py:43-60).

    Pure callable (no parameters); offsets are a baked constant.
    """

    def __init__(self, start=0.0, stop=5.0, num_gaussians=600, width=2.0):
        self.num_output = num_gaussians
        offset = np.linspace(start, stop, num_gaussians)
        self.coeff = -0.5 / float(width * (offset[1] - offset[0])) ** 2
        self.offset = jnp.asarray(offset, dtype=jnp.float32)

    def __call__(self, dist):
        d = dist[..., None] - self.offset
        return jnp.exp(self.coeff * d * d)


class ScaledSwiGLU(nn.Module):
    """SwiGLU with the scaled-SiLU gate (reference activation.py:29-44)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        w = Dense(2 * self.out_channels)(x)
        return swiglu(x, w, self.out_channels, scaled=True)


class SwiGLU(nn.Module):
    """Plain SwiGLU (reference activation.py:48-63)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        w = Dense(2 * self.out_channels)(x)
        return swiglu(x, w, self.out_channels, scaled=False)


class GaussianRadialBasisLayer(nn.Module):
    """Learnable Gaussian RBF (Graphormer-style) — reference
    gaussian_rbf.py:12-45 (dead code in the reference's final models; kept
    for API parity as an alternative distance expansion)."""

    num_basis: int = 128
    cutoff: float = 5.0

    @nn.compact
    def __call__(self, dist):
        mean = self.param(
            "mean",
            lambda k, s: jnp.linspace(0.0, self.cutoff, self.num_basis),
            (self.num_basis,),
        )
        std = self.param(
            "std",
            lambda k, s: jnp.full(s, self.cutoff / self.num_basis),
            (self.num_basis,),
        )
        mul = self.param("mul", nn.initializers.ones, (1,))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        d = mul * dist[..., None] + bias - mean
        std = jnp.abs(std) + 1e-5
        return jnp.exp(-0.5 * (d / std) ** 2) / (
            std * math.sqrt(2.0 * math.pi)
        )
