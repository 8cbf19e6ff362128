"""Fused Pallas S2 activation: value, grad, and grad-of-grad vs XLA reference
(interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from equivarianttransformermpnn4quantumcomputations_tpu.ops.pallas.s2act import (
    s2act_fused,
    s2act_reference,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.s2grid import s2grid

LMAX, MMAX = 3, 2


def setup(n=20, c=8, res=None):
    g = s2grid(LMAX, MMAX, res)
    rng = np.random.default_rng(0)
    K = g.to_grid_mat.shape[-1]
    x = jnp.asarray(rng.normal(size=(n, K, c)).astype(np.float32))
    return g, x


def test_fused_value_matches_reference():
    g, x = setup()
    a = np.asarray(s2act_fused(x, g))
    b = np.asarray(s2act_reference(x, g))
    assert np.abs(a - b).max() < 1e-5, np.abs(a - b).max()


def test_fused_grad_matches_reference():
    g, x = setup()

    def loss_f(fn):
        return lambda t: jnp.sum(jnp.sin(fn(t, g)) ** 2)

    ga = np.asarray(jax.grad(loss_f(s2act_fused))(x))
    gb = np.asarray(jax.grad(loss_f(s2act_reference))(x))
    assert np.abs(ga - gb).max() < 1e-4, np.abs(ga - gb).max()


def test_fused_grad_of_grad_matches_reference():
    """The force-training pattern: d/dx of a loss of grad(x)."""
    g, x = setup(n=10, c=4)

    def make(fn):
        def energy(t):
            return jnp.sum(fn(t, g) ** 2)

        def loss(t):
            forces = jax.grad(energy)(t)
            return jnp.sum(jnp.abs(forces)) + energy(t)

        return jax.grad(loss)

    ga = np.asarray(make(s2act_fused)(x))
    gb = np.asarray(make(s2act_reference)(x))
    assert np.abs(ga - gb).max() < 5e-3, np.abs(ga - gb).max()


def test_fused_nondivisible_tile():
    g, x = setup(n=37, c=8)  # not a multiple of any pow2 tile
    a = np.asarray(s2act_fused(x, g))
    b = np.asarray(s2act_reference(x, g))
    assert np.abs(a - b).max() < 1e-5


def test_fused_under_scan_grad_of_grad():
    """Regression: a pad literal inside the custom_vjp primal corrupted
    residual binding under lax.scan + 2nd-order AD (residuals arrived
    shifted with a () scalar prepended).  Padding now happens outside the
    custom_vjp boundary; the fused chain must match the XLA reference
    through a scanned layer stack in the force-training pattern."""
    g = s2grid(2, 2, None)
    K = g.to_grid_mat.shape[-1]
    C, N, L = 4, 8, 3
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(N, K, C)), jnp.float32)
    Ws = jnp.asarray(rng.normal(size=(L, C, C)) * 0.1, jnp.float32)

    def fwd(Ws, x, fn):
        def body(c, w):
            return c + fn(c @ w, g), None

        out, _ = jax.lax.scan(body, x, Ws)
        return jnp.sum(out ** 2)

    def gog(fn):
        def loss(W, xx):
            return jnp.sum(jax.grad(fwd, argnums=1)(W, xx, fn) ** 2)

        return jax.grad(loss)(Ws, x0)

    ga = np.asarray(gog(s2act_fused))
    gb = np.asarray(gog(s2act_reference))
    assert np.abs(ga - gb).max() < 5e-3, np.abs(ga - gb).max()


@pytest.mark.slow
def test_flagship_model_scan_layers_fused_forces():
    """Full MatPES-GATA model with scan_layers=True and the fused kernel
    (forced in interpret mode): forces match the unrolled fused model with
    identical (re-stacked) parameters."""
    import equivarianttransformermpnn4quantumcomputations_tpu.nn.activations as A
    from equivarianttransformermpnn4quantumcomputations_tpu.data.graph import (
        GraphSample,
        collate,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.models.matpes import (
        EquiformerV2MatPES,
        matpes_energy_forces_stress,
    )

    from equivarianttransformermpnn4quantumcomputations_tpu.utils import flags

    with flags.override(s2_fused="force"):
        rng = np.random.default_rng(7)
        n = 5
        s = GraphSample(
            atomic_numbers=rng.integers(1, 15, size=n).astype(np.int32),
            pos=(rng.normal(size=(n, 3)) * 1.5).astype(np.float32),
        )
        b = {
            k: jnp.asarray(v)
            for k, v in collate([s], 5.0, 20, n_pad=8, e_pad=64)
            .asdict()
            .items()
        }
        kw = dict(
            num_layers=2, sphere_channels=8, attn_hidden_channels=8,
            num_heads=2, attn_alpha_channels=4, attn_value_channels=4,
            ffn_hidden_channels=8, lmax=2, mmax=1, grid_resolution=None,
            edge_channels=8, num_rbf=16, max_num_elements=20,
            alpha_drop=0.0, drop_path_rate=0.0, gata=True, remat=True,
        )
        m_scan = EquiformerV2MatPES(**kw, scan_layers=True)
        p_scan = m_scan.init(jax.random.PRNGKey(0), b)
        out = matpes_energy_forces_stress(m_scan, p_scan, b)
        assert np.isfinite(np.asarray(out["forces"])).all()
        assert np.isfinite(np.asarray(out["energy_total"])).all()

        # unrolled model with the SAME parameters (unstack the scan axis)
        m_unroll = EquiformerV2MatPES(**kw, scan_layers=False)
        p_unroll = m_unroll.init(jax.random.PRNGKey(1), b)

        import flax

        flat_s = flax.traverse_util.flatten_dict(p_scan["params"])
        flat_u = flax.traverse_util.flatten_dict(p_unroll["params"])
        new_u = {}
        for ku in flat_u:
            if any(p.startswith("block_") for p in ku):
                # unrolled: backbone/block_<i>/...  <->
                # scan:     backbone/blocks/block/... with leading layer axis
                i = int(next(p for p in ku if p.startswith("block_"))[6:])
                ks = ku[:1] + ("blocks", "block") + ku[2:]
                val = flat_s[ks][i]
            else:
                val = flat_s[ku]
            new_u[ku] = val
        p_unroll2 = {"params": flax.traverse_util.unflatten_dict(new_u)}
        out_u = matpes_energy_forces_stress(m_unroll, p_unroll2, b)
        fa = np.asarray(out["forces"])
        fb = np.asarray(out_u["forces"])
        assert np.abs(fa - fb).max() < 2e-3, np.abs(fa - fb).max()
