"""Block-sparse dense-Wigner pairs kernel vs the XLA factored path.

``WignerDense`` packs the composite per-edge Wigner-D into flat [E, P] value
tables built once per forward; the pairs kernel (interpret mode on CPU) must
match the factored chain in forward, first/second-order grads, the m0-only
variant, and under lax.scan (the flagship scan_layers regression).
"""

import numpy as np

from equivarianttransformermpnn4quantumcomputations_tpu.utils import flags
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
from equivarianttransformermpnn4quantumcomputations_tpu.ops.pallas.rotate_dense import (
    compute_wigner_dense,
    rotate_from_edge_dense,
    rotate_to_edge_dense,
    rotate_to_edge_m0_dense,
)

LMAX, MMAX = 4, 2
E, C = 96, 16   # E deliberately NOT a multiple of the tile (pad path)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    vec = jnp.asarray(rng.normal(size=(E, 3)), jnp.float32)
    wf = compute_wigner(LMAX, vec)
    wd = compute_wigner_dense(LMAX, MMAX, vec)
    K = (LMAX + 1) ** 2
    x = jnp.asarray(rng.normal(size=(E, K, C)), jnp.float32)
    lay = get_layout(LMAX, MMAX)
    xr = jnp.asarray(
        rng.normal(size=(E, lay.num_coefficients, C)), jnp.float32
    )
    return wf, wd, x, xr, lay


def test_to_edge_forward(data):
    wf, wd, x, _, lay = data
    ref = _rotate_to_edge_factored(wf, x, lay)
    out = rotate_to_edge_dense(wd, x, lay)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_from_edge_forward(data):
    wf, wd, _, xr, lay = data
    ref = _rotate_from_edge_factored(wf, xr, lay)
    out = rotate_from_edge_dense(wd, xr, lay)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_roundtrip_identity_full_mmax(data):
    """No truncation (mmax == lmax): D is orthogonal, from(to(x)) == x."""
    wf, _, x, _, _ = data
    rng = np.random.default_rng(4)
    vec = jnp.asarray(rng.normal(size=(E, 3)), jnp.float32)
    lay_full = get_layout(LMAX, LMAX)
    wd = compute_wigner_dense(LMAX, LMAX, vec)
    y = rotate_to_edge_dense(wd, x, lay_full)
    back = rotate_from_edge_dense(wd, y, lay_full)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(x), rtol=1e-4, atol=1e-4
    )


def test_to_edge_m0_forward_and_grad(data):
    wf, wd, x, _, lay = data
    m0 = np.nonzero(np.asarray(lay.m_complex) == 0)[0]
    ref = _rotate_to_edge_factored(wf, x, lay)[:, m0, :]
    out = rotate_to_edge_m0_dense(wd, x, lay)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    rng = np.random.default_rng(3)
    gw = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)
    g1 = jax.grad(
        lambda v: jnp.sum(rotate_to_edge_m0_dense(wd, v, lay) * gw)
    )(x)
    g2 = jax.grad(
        lambda v: jnp.sum(_rotate_to_edge_factored(wf, v, lay)[:, m0, :] * gw)
    )(x)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5
    )


def test_grads_match_xla(data):
    wf, wd, x, _, lay = data
    rng = np.random.default_rng(1)
    gw = jnp.asarray(
        rng.normal(size=(E, lay.num_coefficients, C)), jnp.float32
    )
    g1 = jax.grad(
        lambda v: jnp.sum(rotate_to_edge_dense(wd, v, lay) * gw)
    )(x)
    g2 = jax.grad(
        lambda v: jnp.sum(_rotate_to_edge_factored(wf, v, lay) * gw)
    )(x)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5
    )


def test_from_edge_grads_match_xla(data):
    wf, wd, x, xr, lay = data
    K = (LMAX + 1) ** 2
    rng = np.random.default_rng(2)
    gw = jnp.asarray(rng.normal(size=(E, K, C)), jnp.float32)
    g1 = jax.grad(
        lambda v: jnp.sum(rotate_from_edge_dense(wd, v, lay) * gw)
    )(xr)
    g2 = jax.grad(
        lambda v: jnp.sum(_rotate_from_edge_factored(wf, v, lay) * gw)
    )(xr)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5
    )


def test_second_order_grads_match_xla(data):
    """Force-style grad-of-grad through to_edge -> silu -> from_edge."""
    wf, wd, x, _, lay = data

    def f_dense(v):
        return rotate_from_edge_dense(
            wd, jax.nn.silu(rotate_to_edge_dense(wd, v, lay)), lay
        )

    def f_ref(v):
        return _rotate_from_edge_factored(
            wf, jax.nn.silu(_rotate_to_edge_factored(wf, v, lay)), lay
        )

    def outer(f):
        def e(v):
            return jnp.sum(f(v) ** 2)

        return jax.grad(lambda v: jnp.sum(jax.grad(e)(v) ** 2))(x)

    np.testing.assert_allclose(
        np.asarray(outer(f_dense)), np.asarray(outer(f_ref)),
        rtol=2e-4, atol=2e-4,
    )


def test_under_scan_with_grad(data):
    """Scan-safe: pad outside custom_vjp, no literal binding in the primal."""
    _, wd, x, _, lay = data

    def layer(carry, _):
        h = rotate_to_edge_dense(wd, carry, lay)
        h = jax.nn.silu(h)
        return rotate_from_edge_dense(wd, h, lay), None

    def loss_scan(v):
        out, _ = jax.lax.scan(layer, v, None, length=3)
        return jnp.sum(out ** 2)

    def loss_unrolled(v):
        h = v
        for _ in range(3):
            h, _ = layer(h, None)
        return jnp.sum(h ** 2)

    v1, g1 = jax.value_and_grad(loss_scan)(x)
    v2, g2 = jax.value_and_grad(loss_unrolled)(x)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5
    )


def test_model_forward_matches_factored():
    """Whole-model parity: wigner_rep dense == factored on a tiny MatPES."""
    from equivarianttransformermpnn4quantumcomputations_tpu.models.matpes import (
        EquiformerV2MatPES,
    )
    import __graft_entry__ as ge

    rng = np.random.default_rng(0)
    raw = ge._synthetic_batch(rng, 2, 6, 16, 128, max_neighbors=5,
                              uniform=True)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    model = EquiformerV2MatPES(
        num_layers=2, sphere_channels=16, attn_hidden_channels=16,
        num_heads=2, attn_alpha_channels=4, attn_value_channels=4,
        ffn_hidden_channels=16, lmax=4, mmax=2, grid_resolution=18,
        edge_channels=16, num_rbf=32, max_num_elements=100, gata=True,
        uniform_blocks=True,
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    with flags.override(wigner="factored"):
        e_ref = model.apply(params, batch)["energy"]
    with flags.override(wigner="dense"):
        e_dense = model.apply(params, batch)["energy"]
    np.testing.assert_allclose(
        np.asarray(e_dense), np.asarray(e_ref), rtol=1e-4, atol=1e-4
    )
