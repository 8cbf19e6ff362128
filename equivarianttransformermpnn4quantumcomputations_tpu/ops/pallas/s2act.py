"""Pallas TPU kernel: fused S2 point-sample activation (+ its derivatives).

The S2 activation  out = F^T silu(A x)  (to-grid -> SiLU -> from-grid,
ops/s2grid.py) is the #1 hot op of the network: the grid tensor
``[N, res_b*res_a, C]`` is ~pts/K (e.g. 324/19 = 17x) larger than the
coefficient tensor, so the XLA path is HBM-bandwidth-bound writing/reading it
(measured 11.3 ms at [10240, 19, 128] grid 18x18 on v5e — vs 0.05 ms for the
SO2 conv GEMMs).  This kernel keeps the grid representation entirely in VMEM
per node-tile: HBM traffic drops to the coefficient tensors only (~17x less).

Derivative structure (force training needs reverse-over-reverse):
* level-1 custom_vjp: fwd kernel K1, bwd -> ``_s2act_bwd`` (a function);
* ``_s2act_bwd`` is itself a custom_vjp: fwd kernel K2
  (dx = A^T (silu'(Ax) . (F dout))), bwd kernel K3 producing the
  second-order cotangents:
      ddout = F^T (silu'(Ax) . (A ddx))
      dx2   = A^T (silu''(Ax) . (F dout) . (A ddx))
  K3 is never differentiated further (training losses need exactly 2nd
  order), so the chain terminates.

All kernels tile the node axis; tables A (to-grid, [P, K]) and F (from-grid,
[P, K]) are small constants resident in VMEM.  Works in interpret mode on
CPU (used by the tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU builds of pallas
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

__all__ = ["s2act_fused", "s2act_reference"]


def _interpret() -> bool:
    from ...utils.backend import on_tpu

    return not on_tpu()


def _block_spec(shape, index_map=None):
    kwargs = {}
    if _VMEM is not None:
        kwargs["memory_space"] = _VMEM
    return pl.BlockSpec(shape, index_map, **kwargs)


def _silu(z):
    return z * jax.nn.sigmoid(z)


def _silu_d1(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


def _silu_d2(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 - s) * (2.0 + z * (1.0 - 2.0 * s))


def _tile_nc(P: int, C: int, n_bufs: int):
    """Pick (node tile T, channel block Cb): the ops are channel-separable,
    so wide-C inputs tile the channel axis instead of shrinking T to nothing.
    n_bufs grid-sized f32 buffers must fit in scoped VMEM (16 MB) together
    with the double-buffered [T, K, Cb] i/o blocks — keep them under ~5 MB.
    """
    budget = 10 * 1024 * 1024
    Cb = min(C, 256)
    while C % Cb:
        Cb //= 2
    t = budget // max(1, n_bufs * P * Cb * 4)
    t = max(1, min(128, int(t)))
    return 1 << (t.bit_length() - 1), Cb


# All kernels use explicit 2D dots on [K, T*C] views: Mosaic's lowering of
# the 3D dot_general with a mid-axis contraction inserts its own relayouts;
# swapping the tiny [T, K, C] block to K-major by hand and issuing plain
# [Pp, K] @ [K, T*C] GEMMs measured 27% faster at the edge site (round 3,
# scripts/s2act_microbench.py: 2.39 -> 1.74 ms fwd at [5120, 19, 128]).
# Tables are pre-padded with zero rows to a sublane multiple Pp (zero grid
# points are exact no-ops through every derivative: silu(0)=0 kills k1, and
# every k2/k3 term carries an A- or F-row factor that is zero there).


def _fwd_dot(M, v):
    # [Pp, K] @ [K, T*C] -> [Pp, T*C], f32 accumulation on the MXU
    return jax.lax.dot_general(
        M, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _adj_dot(M, v):
    # [Pp, K]^T @ [Pp, T*C] -> [K, T*C]
    return jax.lax.dot_general(
        M, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _to_km(ref):
    T, K, C = ref.shape
    return jnp.swapaxes(ref[:], 0, 1).reshape(K, T * C)


def _from_km(v, ref):
    T, K, C = ref.shape
    return jnp.swapaxes(v.reshape(K, T, C), 0, 1).astype(ref.dtype)


def _k1(a_ref, f_ref, x_ref, o_ref):
    # compute dtype follows the input (bf16 under mixed precision -> native
    # bf16 MXU, f32 accumulation); silu runs in f32
    x = _to_km(x_ref)
    A = a_ref[:].astype(x.dtype)
    F = f_ref[:].astype(x.dtype)
    g = _fwd_dot(A, x)  # [Pp, T*C]
    sg = _silu(g).astype(x.dtype)
    o_ref[:] = _from_km(_adj_dot(F, sg), o_ref)


def _k2(a_ref, f_ref, x_ref, do_ref, dx_ref):
    x = _to_km(x_ref)
    do = _to_km(do_ref)
    A = a_ref[:].astype(x.dtype)
    F = f_ref[:].astype(x.dtype)
    g = _fwd_dot(A, x)
    h = _fwd_dot(F, do)
    w = (_silu_d1(g) * h).astype(x.dtype)
    dx_ref[:] = _from_km(_adj_dot(A, w), dx_ref)


def _k3(a_ref, f_ref, x_ref, do_ref, ddx_ref, ddo_ref, dx2_ref):
    x = _to_km(x_ref)
    A = a_ref[:].astype(x.dtype)
    F = f_ref[:].astype(x.dtype)
    g = _fwd_dot(A, x)
    u = _fwd_dot(A, _to_km(ddx_ref))
    h = _fwd_dot(F, _to_km(do_ref))
    ddo = _adj_dot(F, (_silu_d1(g) * u).astype(x.dtype))
    dx2 = _adj_dot(A, (_silu_d2(g) * h * u).astype(x.dtype))
    ddo_ref[:] = _from_km(ddo, ddo_ref)
    dx2_ref[:] = _from_km(dx2, dx2_ref)


def _call(kernel, A, F, inputs, n_out: int, n_grid_bufs: int):
    """Tile nodes x channel-blocks and invoke ``kernel`` (tables first).

    When the node axis is already tile-aligned, NO pad/slice ops are emitted:
    a ``jnp.pad`` inside a custom_vjp primal binds a scalar literal that
    corrupts the residual binding under ``lax.scan`` + second-order AD
    (jax 0.9.0 — observed: bwd residuals arrive shifted by one with a ()
    scalar prepended).  ``s2act_fused`` pre-pads outside the custom_vjp
    boundary so the scan path always hits the aligned branch.
    """
    x = inputs[0]
    N, K, C = x.shape
    P = A.shape[0]
    T, Cb = _tile_nc(P, C, n_grid_bufs)
    n_tiles = -(-N // T)
    n_cblk = C // Cb
    pad = n_tiles * T - N
    if pad == 0:
        padded = list(inputs)
    else:
        padded = [jnp.pad(v, ((0, pad), (0, 0), (0, 0))) for v in inputs]

    table_spec = _block_spec((P, K), lambda i, j: (0, 0))
    io_spec = _block_spec((T, K, Cb), lambda i, j: (i, 0, j))
    out_shapes = tuple(
        jax.ShapeDtypeStruct((n_tiles * T, K, C), x.dtype)
        for _ in range(n_out)
    )
    out_specs = tuple(io_spec for _ in range(n_out))
    res = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_cblk),
        in_specs=[table_spec, table_spec] + [io_spec] * len(inputs),
        out_specs=out_specs if n_out > 1 else out_specs[0],
        out_shape=out_shapes if n_out > 1 else out_shapes[0],
        interpret=_interpret(),
    )(A, F, *padded)
    if pad == 0:
        return res
    if n_out == 1:
        return res[:N]
    return tuple(r[:N] for r in res)


# Tables are EXPLICIT custom_vjp arguments (with zero cotangents), not
# closures: under jax.checkpoint/nn.scan, closed-over array constants get
# hoisted into the jaxpr's inputs, which misaligns the custom_vjp residual
# binding (observed: bwd received the table where x was expected).


# ── level 2: first backward, itself differentiable once ─────────────────
@jax.custom_vjp
def _s2_bwd(x, dout, A, F):
    return _call(_k2, A, F, (x, dout), n_out=1, n_grid_bufs=3)


def _s2_bwd_fwd(x, dout, A, F):
    return _s2_bwd(x, dout, A, F), (x, dout, A, F)


def _s2_bwd_bwd(res, ddx):
    x, dout, A, F = res
    ddout, dx2 = _call(_k3, A, F, (x, dout, ddx), n_out=2, n_grid_bufs=4)
    return dx2, ddout, jnp.zeros_like(A), jnp.zeros_like(F)


_s2_bwd.defvjp(_s2_bwd_fwd, _s2_bwd_bwd)


# ── level 1: the activation ──────────────────────────────────────────────
@jax.custom_vjp
def _s2_act(x, A, F):
    return _call(_k1, A, F, (x,), n_out=1, n_grid_bufs=2)


def _s2_act_fwd(x, A, F):
    return _s2_act(x, A, F), (x, A, F)


def _s2_act_bwd(res, dout):
    x, A, F = res
    return _s2_bwd(x, dout, A, F), jnp.zeros_like(A), jnp.zeros_like(F)


_s2_act.defvjp(_s2_act_fwd, _s2_act_bwd)


@functools.lru_cache(maxsize=None)
def _tables(grid_key):
    from ..s2grid import s2grid

    grid = s2grid(*grid_key)
    P = grid.res_beta * grid.res_alpha
    K = grid.to_grid_mat.shape[-1]
    # numpy (not jnp): building these under an active jit trace would create
    # and cache tracers (UnexpectedTracerError on the next trace)
    A = np.asarray(grid.to_grid_mat, dtype=np.float32).reshape(P, K)
    F = np.asarray(grid.from_grid_mat, dtype=np.float32).reshape(P, K)
    # pad the grid-point axis to a sublane multiple: zero rows are exact
    # no-ops through all three kernels (see the kernel block comment)
    Pp = -(-P // 8) * 8
    if Pp != P:
        A = np.pad(A, ((0, Pp - P), (0, 0)))
        F = np.pad(F, ((0, Pp - P), (0, 0)))
    return A, F


# the node-axis tile never exceeds 128 (see _tile_nc); padding N to a
# multiple of it OUTSIDE the custom_vjp keeps pad/slice ops out of every
# custom_vjp primal in the chain (k2/k3 tiles are smaller powers of two, so
# they divide this too) — required for lax.scan + grad-of-grad (see _call)
_MAX_TILE = 128


def s2act_fused(x, grid):
    """Fused S2 activation for an S2Grid (see module docstring)."""
    A, F = _tables(grid.cache_key)
    N = x.shape[0]
    pad = (-N) % _MAX_TILE
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    out = _s2_act(x, jnp.asarray(A), jnp.asarray(F))
    return out[:N] if pad else out


def s2act_reference(x, grid):
    """Plain-XLA reference (for tests)."""
    return grid.from_grid(jax.nn.silu(grid.to_grid(x)))
