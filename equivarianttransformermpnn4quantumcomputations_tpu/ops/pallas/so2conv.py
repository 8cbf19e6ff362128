"""Pallas TPU kernel: fused SO(2) convolution (all m-blocks, one call).

Second attempt at the BASELINE.md north-star kernel (VERDICT r4 #2; the
round-3 rotate+conv fusion lost to per-call AD overheads and was removed).
This one fuses ONLY the convolution site, where the isolated-site profile
shows the XLA lowering spends ~75% of its time on movement, not matmuls
(conv1_full fwd 3.03 ms vs 0.56 ms ideal-GEMM = 18% of roofline; the
rest is the m-primary permutation gathers, K-major layout copies, radial
slice-multiplies, and the concat dynamic-update-slices — PERF.md round-5
site profile).

Design: one kernel per conv site covering every m-block.

    for each m-primary input row j (static):   # 19 rows at lmax 4/mmax 2
        acc[group(j)] += x[:, lrow(j), :] @ W[j]     # MXU dot, K = Cin

* input rows are read straight from the L-PRIMARY layout via a static row
  map — the ``to_m_perm`` gather disappears;
* outputs are lane-sliced out of the per-group accumulators and written
  straight to their l-primary rows — the output concat +
  ``from_m_perm`` gather disappears;
* the complex butterfly is pre-baked into the per-group weight matrix
  ``[[wr, wi], [-wi, wr]]`` (XLA assembles it, it is tiny);
* the m=0 extra channels (attention alpha + gate scalars) come out as a
  second kernel output — no slice of a bigger GEMM.

Differentiation: the operator is bilinear in (x, W).  One custom_vjp per
direction with mutually-recursive linear cores (same scheme as
ops/pallas/rotate_dense.py): d/dx of the forward is the adjoint kernel
with transposed weights; d/dW is a plain XLA einsum of the saved input
with the cotangent (differentiable, so grad-of-grad force training works).

Reference: models/EquiformerV2Functions/so2_ops.py:64-204 (the per-m
Linear loop this replaces).
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

__all__ = ["so2conv_fused", "so2conv_supported"]


def _interpret() -> bool:
    from ...utils.backend import on_tpu

    return not on_tpu()


def _block_spec(shape, index_map=None):
    kwargs = {}
    if _VMEM is not None:
        kwargs["memory_space"] = _VMEM
    return pl.BlockSpec(shape, index_map, **kwargs)


@functools.lru_cache(maxsize=None)
def _row_maps(lmax: int, mmax: int):
    """Static row bookkeeping.

    Returns dict with, per m-group g (g=0 is m=0):
      in_rows[g]:  l-primary row indices feeding the group's GEMM, in the
                   m-primary order the packed weight expects (real rows
                   then imaginary rows for m>0);
      out_rows[g]: l-primary rows receiving the group's outputs, same
                   order.
    """
    from ..irreps import layout as get_layout

    lay = get_layout(lmax, mmax)
    # to_m_perm lists l-primary indices in m-primary order, grouped
    # m=0 block (L0 rows), then per m: L_m real rows + L_m imag rows
    perm = np.asarray(lay.to_m_perm)
    sizes = [int(lay.m_size[0])] + [
        2 * int(lay.m_size[m]) for m in range(1, lay.mmax + 1)
    ]
    groups = []
    off = 0
    for sz in sizes:
        groups.append(perm[off : off + sz].copy())
        off += sz
    return groups


def so2conv_supported(layout, Cin: int, Cout: int, extra: int) -> bool:
    """Shapes the Mosaic lowering handles: 128-aligned channel (lane)
    dims everywhere."""
    return (
        Cin % 128 == 0
        and Cout % 128 == 0
        and extra % 128 == 0
    )


# ── kernels ───────────────────────────────────────────────────────────────


def _fwd_kernel(x_ref, *w_refs_and_out, groups, extra, Cout):
    n_g = len(groups)
    w_refs = w_refs_and_out[:n_g]
    o_ref = w_refs_and_out[n_g]
    e_ref = w_refs_and_out[n_g + 1] if extra else None

    x = x_ref[:]                      # [T, K, Cin]
    T, K, Cin = x.shape
    for g, rows in enumerate(groups):
        W = w_refs[g][:]              # [len(rows)*Cin, N_g]
        N = W.shape[1]
        acc = jnp.zeros((T, N), dtype=jnp.float32)
        for j, lrow in enumerate(rows):
            xj = x[:, int(lrow), :]
            acc = acc + jax.lax.dot_general(
                xj, W[j * Cin : (j + 1) * Cin, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        base = 0
        if g == 0 and extra:
            e_ref[:] = acc[:, :extra].astype(e_ref.dtype)
            base = extra
        for j, lrow in enumerate(rows):
            o_ref[:, int(lrow), :] = acc[
                :, base + j * Cout : base + (j + 1) * Cout
            ].astype(o_ref.dtype)


def _adj_kernel(y_ref, *rest, groups, extra, Cin, has_extra_in):
    """Adjoint: dx[:, lrow_j, :] = dY_g @ W_g[j]^T — implemented as
    per-output-row dots against the transposed weight slices (the caller
    passes W^T blocks [N_g, len(rows)*Cin])."""
    n_g = len(groups)
    if has_extra_in:
        e_ref = rest[0]
        w_refs = rest[1 : 1 + n_g]
        o_ref = rest[1 + n_g]
    else:
        e_ref = None
        w_refs = rest[:n_g]
        o_ref = rest[n_g]

    y = y_ref[:]                      # [T, K, Cout]
    T, K, Cout = y.shape
    for g, rows in enumerate(groups):
        Wt = w_refs[g][:]             # [N_g, len(rows)*Cin]
        n_rows = len(rows)
        Cin_ = Wt.shape[1] // n_rows
        # dY_g lanes: [extra?] + per-row Cout slices; contract directly
        # row by row to avoid materializing the concatenated dY
        accs = jnp.zeros((T, n_rows * Cin_), dtype=jnp.float32)
        base = 0
        if g == 0 and has_extra_in:
            accs = accs + jax.lax.dot_general(
                e_ref[:], Wt[:e_ref.shape[1], :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            base = e_ref.shape[1]
        for j, lrow in enumerate(rows):
            yj = y[:, int(lrow), :]
            accs = accs + jax.lax.dot_general(
                yj, Wt[base + j * Cout : base + (j + 1) * Cout, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        for j, lrow in enumerate(rows):
            o_ref[:, int(lrow), :] = accs[
                :, j * Cin_ : (j + 1) * Cin_
            ].astype(o_ref.dtype)


# ── pallas_call wrappers ──────────────────────────────────────────────────


def _call_fwd(x, ws, groups, extra, Cout, K_out):
    E, K, Cin = x.shape
    T = 256 if E % 256 == 0 else 128
    n_tiles = E // T
    kwargs = {}
    if pltpu is not None and not _interpret():
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        )
    out_shapes = [jax.ShapeDtypeStruct((E, K_out, Cout), x.dtype)]
    out_specs = [_block_spec((T, K_out, Cout), lambda i: (i, 0, 0))]
    if extra:
        out_shapes.append(jax.ShapeDtypeStruct((E, extra), x.dtype))
        out_specs.append(_block_spec((T, extra), lambda i: (i, 0)))
    kern = functools.partial(
        _fwd_kernel, groups=tuple(map(tuple, groups)), extra=extra,
        Cout=Cout,
    )
    res = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[_block_spec((T, K, Cin), lambda i: (i, 0, 0))]
        + [
            _block_spec(w.shape, lambda i: (0,) * w.ndim) for w in ws
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
        **kwargs,
    )(x, *ws)
    return (res[0], res[1]) if extra else (res[0], None)


def _call_adj(y, dextra, wts, groups, extra, Cin, K_in):
    E, K, Cout = y.shape
    T = 256 if E % 256 == 0 else 128
    n_tiles = E // T
    kwargs = {}
    if pltpu is not None and not _interpret():
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        )
    kern = functools.partial(
        _adj_kernel, groups=tuple(map(tuple, groups)), extra=extra,
        Cin=Cin, has_extra_in=dextra is not None,
    )
    ins = [y]
    in_specs = [_block_spec((T, K, Cout), lambda i: (i, 0, 0))]
    if dextra is not None:
        ins.append(dextra)
        in_specs.append(_block_spec((T, extra), lambda i: (i, 0)))
    ins.extend(wts)
    in_specs.extend(
        _block_spec(w.shape, lambda i: (0,) * w.ndim) for w in wts
    )
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=_block_spec((T, K_in, Cin), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((E, K_in, Cin), y.dtype),
        interpret=_interpret(),
        **kwargs,
    )(*ins)


# ── differentiable core (custom_vjp, mutual linear pair) ──────────────────


class _Aux:
    """Hashable static config for one conv site."""

    def __init__(self, lmax, mmax, Cin, Cout, extra):
        self.lmax, self.mmax = lmax, mmax
        self.Cin, self.Cout, self.extra = Cin, Cout, extra

    def key(self):
        return (self.lmax, self.mmax, self.Cin, self.Cout, self.extra)

    def __hash__(self):
        return hash(self.key())

    def __eq__(self, o):
        return isinstance(o, _Aux) and o.key() == self.key()


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _core(x, ws, aux: _Aux):
    """(y [E, K, Cout], extra [E, extra] | None) from x [E, K, Cin] and the
    packed per-group weights ws (tuple, group g: [len(rows_g)*Cin, N_g])."""
    groups = _row_maps(aux.lmax, aux.mmax)
    K = sum(len(g) for g in groups)
    return _call_fwd(x, tuple(ws), groups, aux.extra, aux.Cout, K)


def _core_fwd(x, ws, aux):
    return _core(x, ws, aux), (x, ws)


def _core_bwd(aux, res, cot):
    x, ws = res
    dy, dextra = cot
    groups = _row_maps(aux.lmax, aux.mmax)
    if aux.extra == 0:
        dextra = None
    dx = _core_adj(dy, dextra, ws, aux)
    # dW_g = [rows of x]^T @ [extra? | rows of dy]  — plain XLA einsums
    dws = []
    for g, rows in enumerate(groups):
        xg = jnp.concatenate(
            [x[:, int(r), :] for r in rows], axis=1
        )  # [E, n_rows*Cin]
        outs = []
        if g == 0 and aux.extra:
            outs.append(dextra)
        outs.extend(dy[:, int(r), :] for r in rows)
        yg = jnp.concatenate(outs, axis=1)      # [E, N_g]
        dws.append(
            jax.lax.dot_general(
                xg, yg, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(ws[g].dtype)
        )
    return dx, tuple(dws)


_core.defvjp(_core_fwd, _core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _core_adj(dy, dextra, ws, aux: _Aux):
    """Adjoint of _core wrt x: linear in (dy, dextra)."""
    groups = _row_maps(aux.lmax, aux.mmax)
    K = sum(len(g) for g in groups)
    wts = tuple(jnp.swapaxes(w, 0, 1) for w in ws)
    return _call_adj(dy, dextra, wts, groups, aux.extra, aux.Cin, K)


def _core_adj_fwd(dy, dextra, ws, aux):
    return _core_adj(dy, dextra, ws, aux), (dy, dextra, ws)


def _core_adj_bwd(aux, res, dx_cot):
    dy, dextra, ws = res
    groups = _row_maps(aux.lmax, aux.mmax)
    # adjoint of the adjoint = forward direction applied to the cotangent
    ddy, ddextra = _core(dx_cot, ws, aux)
    # dW_g^T contribution: [extra?|dy rows]^T-side einsum with dx_cot rows
    dws = []
    for g, rows in enumerate(groups):
        xg = jnp.concatenate(
            [dx_cot[:, int(r), :] for r in rows], axis=1
        )
        outs = []
        if g == 0 and aux.extra:
            outs.append(dextra)
        outs.extend(dy[:, int(r), :] for r in rows)
        yg = jnp.concatenate(outs, axis=1)
        dws.append(
            jax.lax.dot_general(
                xg, yg, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(ws[g].dtype)
        )
    if aux.extra == 0:
        ddextra = None
    return ddy, ddextra, tuple(dws)


_core_adj.defvjp(_core_adj_fwd, _core_adj_bwd)


# ── public entry ──────────────────────────────────────────────────────────

_TILE = 128


def so2conv_fused(x, ws, lmax: int, mmax: int, Cout: int, extra: int):
    """Fused SO(2) conv.  x: [E, K_red, Cin] l-primary (radial scaling, if
    any, already applied); ws: per-group packed weights
    (m=0: [L0*Cin, extra + L0*Cout]; m>0: butterfly [2Lm*Cin, 2Lm*Cout]).
    Returns (y [E, K_red, Cout], extra [E, extra] | None)."""
    E = x.shape[0]
    aux = _Aux(lmax, mmax, x.shape[2], Cout, extra)
    pad = (-E) % _TILE
    if pad:  # outside the custom_vjp (scan + 2nd-order AD safety)
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    y, ex = _core(x, tuple(ws), aux)
    if pad:
        y = y[:E]
        ex = ex[:E] if ex is not None else None
    return y, ex
