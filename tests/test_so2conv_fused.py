"""Fused SO(2)-conv kernel (ops/pallas/so2conv.py) vs the XLA path —
forward, first-order, and grad-of-grad (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equivarianttransformermpnn4quantumcomputations_tpu.nn.so3_layers import (
    SO2Conv,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.irreps import (
    layout as get_layout,
)
from equivarianttransformermpnn4quantumcomputations_tpu.utils import flags

E = 128          # one kernel tile
LMAX, MMAX = 4, 2


def _setup(extra, rad, Cin=128, Cout=128):
    lay = get_layout(LMAX, MMAX)
    K = int(lay.num_coefficients)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(E, K, Cin)).astype(np.float32))
    scal = jnp.asarray(rng.normal(size=(E, 32)).astype(np.float32))
    conv = SO2Conv(
        layout=lay, in_channels=Cin, out_channels=Cout, extra_m0=extra,
        rad_channels=(32, 32) if rad else None,
    )
    params = conv.init(jax.random.PRNGKey(0), x, scal if rad else None)
    return conv, params, x, (scal if rad else None)


@pytest.mark.parametrize("extra,rad", [(0, False), (256, True)])
def test_fused_matches_xla_forward(extra, rad):
    conv, params, x, scal = _setup(extra, rad)
    with flags.override(conv_fused="off"):
        out_ref, ex_ref = conv.apply(params, x, scal)
    with flags.override(conv_fused="force"):
        out_k, ex_k = conv.apply(params, x, scal)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )
    if extra:
        np.testing.assert_allclose(
            np.asarray(ex_k), np.asarray(ex_ref), rtol=2e-5, atol=2e-5
        )


@pytest.mark.parametrize("extra,rad", [(256, True)])
def test_fused_matches_xla_grads(extra, rad):
    conv, params, x, scal = _setup(extra, rad)

    def loss(mode, p, xx):
        with flags.override(conv_fused=mode):
            out, ex = conv.apply(p, xx, scal)
            tot = jnp.sum(out**2)
            if ex is not None:
                tot = tot + jnp.sum(jnp.cos(ex))
            return tot

    g_ref = jax.grad(lambda p, xx: loss("off", p, xx), argnums=(0, 1))(
        params, x
    )
    g_k = jax.grad(lambda p, xx: loss("force", p, xx), argnums=(0, 1))(
        params, x
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_k), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4
        )


def test_fused_grad_of_grad_matches():
    """Force-training pattern: outer grad (params) of an inner grad (x)."""
    conv, params, x, scal = _setup(128, False)

    def outer(mode, p):
        def inner(xx):
            with flags.override(conv_fused=mode):
                out, ex = conv.apply(p, xx, scal)
                return jnp.sum(out**2) + jnp.sum(ex**2)

        gx = jax.grad(inner)(x)
        return jnp.sum(gx**2)

    v_ref, g_ref = jax.value_and_grad(lambda p: outer("off", p))(params)
    v_k, g_k = jax.value_and_grad(lambda p: outer("force", p))(params)
    np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_k), jax.tree_util.tree_leaves(g_ref)
    ):
        # 2nd-order values are O(1e2) sums of squares; the kernel's f32
        # accumulation order differs from XLA's -> ~1e-3 absolute noise
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-3
        )
