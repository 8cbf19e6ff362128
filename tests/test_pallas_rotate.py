"""Fused pallas rotate kernel vs the XLA factored path (interpret mode).

The kernel is linear in x with a mutually-recursive custom_vjp pair, so we
check forward parity, first-order grads, second-order (force-style) grads,
the orthogonality identity at mmax == lmax, and behavior under lax.scan.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equivarianttransformermpnn4quantumcomputations_tpu.ops.irreps import (
    layout as get_layout,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.rotation import (
    _rotate_from_edge_factored,
    _rotate_to_edge_factored,
    compute_wigner,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.pallas.rotate import (
    rotate_from_edge_fused,
    rotate_to_edge_fused,
)

LMAX, MMAX = 4, 2
E, C = 96, 16   # E deliberately NOT a multiple of the tile (pad path)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    vec = jnp.asarray(rng.normal(size=(E, 3)), jnp.float32)
    w = compute_wigner(LMAX, vec)
    K = (LMAX + 1) ** 2
    x = jnp.asarray(rng.normal(size=(E, K, C)), jnp.float32)
    lay = get_layout(LMAX, MMAX)
    xr = jnp.asarray(
        rng.normal(size=(E, lay.num_coefficients, C)), jnp.float32
    )
    return w, x, xr, lay


def test_to_edge_forward(data):
    w, x, _, lay = data
    ref = _rotate_to_edge_factored(w, x, lay)
    out = rotate_to_edge_fused(w, x, lay)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_from_edge_forward(data):
    w, _, xr, lay = data
    ref = _rotate_from_edge_factored(w, xr, lay)
    out = rotate_from_edge_fused(w, xr, lay)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_roundtrip_identity_full_mmax(data):
    """No truncation (mmax == lmax): D is orthogonal, from(to(x)) == x."""
    w, x, _, _ = data
    lay_full = get_layout(LMAX, LMAX)
    y = rotate_to_edge_fused(w, x, lay_full)
    back = rotate_from_edge_fused(w, y, lay_full)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(x), rtol=1e-4, atol=1e-4
    )


def test_to_edge_m0_forward_and_grad(data):
    """m0-only variant == the m = 0 rows of the full rotate (fwd + grad)."""
    from equivarianttransformermpnn4quantumcomputations_tpu.ops.pallas.rotate import (
        rotate_to_edge_m0_fused,
    )

    w, x, _, lay = data
    m0 = np.nonzero(np.asarray(lay.m_complex) == 0)[0]
    ref = _rotate_to_edge_factored(w, x, lay)[:, m0, :]
    out = rotate_to_edge_m0_fused(w, x, lay)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    rng = np.random.default_rng(3)
    gw = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)
    g1 = jax.grad(
        lambda v: jnp.sum(rotate_to_edge_m0_fused(w, v, lay) * gw)
    )(x)
    g2 = jax.grad(
        lambda v: jnp.sum(_rotate_to_edge_factored(w, v, lay)[:, m0, :] * gw)
    )(x)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5
    )


def test_grads_match_xla(data):
    w, x, _, lay = data
    rng = np.random.default_rng(1)
    gw = jnp.asarray(
        rng.normal(size=(E, lay.num_coefficients, C)), jnp.float32
    )

    def loss_fused(x):
        return jnp.sum(rotate_to_edge_fused(w, x, lay) * gw)

    def loss_ref(x):
        return jnp.sum(_rotate_to_edge_factored(w, x, lay) * gw)

    g1 = jax.grad(loss_fused)(x)
    g2 = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5
    )


def test_from_edge_grads_match_xla(data):
    w, x, xr, lay = data
    K = (LMAX + 1) ** 2
    rng = np.random.default_rng(2)
    gw = jnp.asarray(rng.normal(size=(E, K, C)), jnp.float32)

    g1 = jax.grad(
        lambda v: jnp.sum(rotate_from_edge_fused(w, v, lay) * gw)
    )(xr)
    g2 = jax.grad(
        lambda v: jnp.sum(_rotate_from_edge_factored(w, v, lay) * gw)
    )(xr)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5
    )


def _pipeline(rot_to, rot_from, w, lay):
    """to_edge -> nonlinearity -> from_edge (a mini attention value path)."""

    def f(x):
        h = rot_to(w, x, lay)
        h = jax.nn.silu(h)
        return rot_from(w, h, lay)

    return f


def test_second_order_grads_match_xla(data):
    """Force-style grad-of-grad through to_edge -> silu -> from_edge."""
    w, x, _, lay = data

    f_fused = _pipeline(rotate_to_edge_fused, rotate_from_edge_fused, w, lay)
    f_ref = _pipeline(
        _rotate_to_edge_factored, _rotate_from_edge_factored, w, lay
    )

    def outer(f):
        def e(x):
            return jnp.sum(f(x) ** 2)

        def force_norm(x):
            return jnp.sum(jax.grad(e)(x) ** 2)

        return jax.grad(force_norm)(x)

    g1 = outer(f_fused)
    g2 = outer(f_ref)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=2e-4
    )


def test_under_scan_with_grad(data):
    """The kernels must be scan-safe (pad outside custom_vjp; no literal
    binding in the primal) — mirrors the s2act scan regression."""
    w, x, _, lay = data

    def layer(carry, _):
        h = rotate_to_edge_fused(w, carry, lay)
        h = jax.nn.silu(h)
        return rotate_from_edge_fused(w, h, lay), None

    def loss_scan(x):
        out, _ = jax.lax.scan(layer, x, None, length=3)
        return jnp.sum(out ** 2)

    def loss_unrolled(x):
        h = x
        for _ in range(3):
            h, _ = layer(h, None)
        return jnp.sum(h ** 2)

    v1, g1 = jax.value_and_grad(loss_scan)(x)
    v2, g2 = jax.value_and_grad(loss_unrolled)(x)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5
    )
