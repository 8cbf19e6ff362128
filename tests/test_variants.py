"""Variant tests: MoE FFN, dual-stream, phi-every-layer, ablation flags."""

import numpy as np

from equivarianttransformermpnn4quantumcomputations_tpu.utils import flags
import jax
import jax.numpy as jnp
import pytest

from equivarianttransformermpnn4quantumcomputations_tpu.data.graph import (
    GraphSample,
    collate,
)
from equivarianttransformermpnn4quantumcomputations_tpu.models.matpes import (
    EquiformerV2MatPES,
)

TINY = dict(
    num_layers=2,
    sphere_channels=16,
    attn_hidden_channels=16,
    num_heads=2,
    attn_alpha_channels=4,
    attn_value_channels=4,
    ffn_hidden_channels=16,
    lmax=2,
    mmax=1,
    grid_resolution=None,
    edge_channels=16,
    num_rbf=32,
    max_num_elements=20,
    cutoff=5.0,
    alpha_drop=0.0,
    drop_path_rate=0.0,
    gata=True,
)


def batch(rng, n=6):
    s = GraphSample(
        atomic_numbers=rng.integers(1, 15, size=n).astype(np.int32),
        pos=(rng.normal(size=(n, 3)) * 1.5).astype(np.float32),
        energy=0.0,
        forces=np.zeros((n, 3), np.float32),
    )
    pb = collate([s], 5.0, 20, n_pad=8, e_pad=64)
    return {k: jnp.asarray(v) for k, v in pb.asdict().items()}


@pytest.mark.parametrize(
    "kw",
    [
        {"ffn_variant": "moe"},
        {"ffn_variant": "moe_breaking"},
        {"ffn_variant": "tensor_product", "dual_stream": True},
        {"use_phi_every_layer": True},
        {"normalize_attn_output": False},
        {"dual_stream": True},
    ],
)
def test_variant_forward(kw):
    rng = np.random.default_rng(0)
    b = batch(rng)
    model = EquiformerV2MatPES(**TINY, **kw)
    params = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(params, b)
    assert np.isfinite(np.asarray(out["energy_total"])).all()


def test_moe_routing_entropy_sown():
    rng = np.random.default_rng(1)
    b = batch(rng)
    model = EquiformerV2MatPES(**TINY, ffn_variant="moe")
    params = model.init(jax.random.PRNGKey(0), b)
    out, inter = model.apply(params, b, mutable=["intermediates"])
    flat = jax.tree_util.tree_leaves(inter)
    assert len(flat) >= 1
    # softmax over 4 experts: entropy in [0, log 4]
    for e in flat:
        assert 0.0 <= float(e) <= np.log(4) + 1e-5


def test_m0_only_matches_full_path(monkeypatch):
    """GATA attention with the m0-only rotate/conv shortcut must be exactly
    equal to the full rotate + full SO2 conv path (same param structure —
    the m > 0 weights are declared but skipped)."""
    rng = np.random.default_rng(2)
    b = batch(rng)
    model = EquiformerV2MatPES(**TINY)
    params = model.init(jax.random.PRNGKey(0), b)
    out_m0 = model.apply(params, b)
    with flags.override(m0_only=False):
        out_full = model.apply(params, b)
    np.testing.assert_allclose(
        np.asarray(out_m0["energy_total"]),
        np.asarray(out_full["energy_total"]),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_m0["node_energy"]),
        np.asarray(out_full["node_energy"]),
        rtol=1e-5, atol=1e-6,
    )
