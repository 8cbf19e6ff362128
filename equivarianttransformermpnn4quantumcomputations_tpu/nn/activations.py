"""Equivariant activations: gate, S2 point-sample, separable S2.

Re-designs of reference models/EquiformerV2Functions/activation.py:107-192.
The S2 activation is the to-grid -> SiLU -> from-grid sandwich: two einsums
around a pointwise nonlinearity — exactly the fusion pattern XLA handles well
(both einsums are matmuls against small constant tables from ops/s2grid.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.irreps import IrrepsLayout
from ..ops.s2grid import S2Grid

__all__ = ["gate_activation", "s2_activation", "separable_s2_activation"]


def _gate_expand_index(lmax: int, mmax: int) -> np.ndarray:
    """Map each l>0 coefficient of the (lmax, mmax) reduced layout to l-1."""
    parts = [
        np.full(min(2 * l + 1, 2 * mmax + 1), l - 1) for l in range(1, lmax + 1)
    ]
    return np.concatenate(parts)


def gate_activation(gating_scalars, x, lmax: int, mmax: int, num_channels: int):
    """Sigmoid gates per degree on l>0 components; SiLU on l=0.

    Reference activation.py:107-150.

    Args:
        gating_scalars: [N, lmax * C]
        x: [N, K_red, C]
    """
    g = jax.nn.sigmoid(gating_scalars)
    g = g.reshape(g.shape[0], lmax, num_channels)
    g = g[:, _gate_expand_index(lmax, mmax), :]
    scalars = jax.nn.silu(x[:, :1, :])
    vectors = x[:, 1:, :] * g
    return jnp.concatenate([scalars, vectors], axis=1)


# Auto-chunking: the grid representation [N, res_b, res_a, C] is the single
# largest activation in the network (e.g. [12288 edges, 18, 18, 128] = 2 GB).
# When it would exceed the chunk threshold, process the leading axis in
# lax.map chunks — the scan forces XLA to schedule chunks sequentially, so
# peak memory drops to one chunk while FLOPs are unchanged.
# With the jax.checkpoint below, grid tensors are transients (never stored as
# AD residuals), so the threshold only needs to bound the *live* working set:
# keep it high — fine-grained chunking serializes the MXU and costs far more
# than it saves (measured 3x step-time regression at 32 MB chunks).
#
# Path selection comes from utils/flags.py (import-time env resolution +
# scoped overrides) — never os.environ at trace time (VERDICT r4 #6).
from ..utils import flags as _flags


def _use_fused(n_rows: int | None, n_channels: int,
               kern: _flags.KernelFlags) -> bool:
    # fused Pallas kernel (ops/pallas/s2act.py): grid tensors never touch
    # HBM.  s2_fused: 'auto' = on TPU; 'off' = never; 'force' = even
    # off-TPU (interpret mode — tests of the kernel AD chain on CPU).
    # s2_fused_min_rows routes small sites to plain XLA; default 0
    # (kernel everywhere on TPU): the per-op microbench says XLA-ckpt wins
    # the flagship FFN site, but COMPOSED into the unrolled force-training
    # step the XLA-ckpt route measured ~195 ms/step SLOWER (round 3).
    if kern.s2_fused == "force":
        return True
    if kern.s2_fused == "off":
        return False
    if n_rows is not None and n_rows < kern.s2_fused_min_rows:
        return False
    # Mosaic rejects the kernel's K-major [K, T*C] reshape unless the
    # channel (lane) axis is 128-aligned ("infer-vector-layout: unsupported
    # shape cast" at C=32, found on the fixture-scale models) — small-C
    # sites route to the XLA path, which XLA fuses well at those widths.
    if n_channels % 128 != 0:
        return False
    from ..utils.backend import on_tpu

    return on_tpu()


def s2_activation(x, grid: S2Grid, kern: _flags.KernelFlags | None = None):
    """Point-sample S2 activation: to-grid, SiLU, from-grid.

    Reference activation.py:153-170.  x: [N, K_red, C].
    """
    kern = kern if kern is not None else _flags.current()
    N, K, C = x.shape
    pts = grid.res_beta * grid.res_alpha
    full_bytes = N * pts * C * 4

    if _use_fused(N, C, kern):
        from ..ops.pallas.s2act import s2act_fused

        return s2act_fused(x, grid)

    # checkpoint: the SiLU's grid-space pre-activation [*, res_b, res_a, C]
    # is ~pts/K (e.g. 13x) larger than the coefficient input — recomputing it
    # in backward passes instead of storing it is what keeps grad-of-grad
    # force training inside HBM (residual = the small coefficient tensor).
    def act(xc):
        return grid.from_grid(jax.nn.silu(grid.to_grid(xc)))

    if kern.s2_ckpt:
        act = jax.checkpoint(act)

    if full_bytes <= kern.s2_chunk_threshold_mb * 1024 * 1024:
        return act(x)

    chunk_target = kern.s2_chunk_mb * 1024 * 1024
    chunk = max(8, (chunk_target // (pts * C * 4)) // 8 * 8)
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    ys = jax.lax.map(act, xp.reshape(n_chunks, chunk, K, C))
    return ys.reshape(n_chunks * chunk, K, C)[:N]


def separable_s2_activation(gating_scalars, x, grid: S2Grid,
                            kern: _flags.KernelFlags | None = None):
    """SiLU on separate l=0 scalars; S2 activation on the full tensor, keeping
    only its l>0 part.  Reference activation.py:173-192.

    Args:
        gating_scalars: [N, C]
        x: [N, K_red, C]
    """
    scalars = jax.nn.silu(gating_scalars)[:, None, :]
    tensors = s2_activation(x, grid, kern)
    return jnp.concatenate([scalars, tensors[:, 1:, :]], axis=1)
