"""Registry: every reference model file has a named, constructible entry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equivarianttransformermpnn4quantumcomputations_tpu.data.graph import (
    GraphSample,
    collate,
)
from equivarianttransformermpnn4quantumcomputations_tpu.models.registry import (
    count_params,
    list_models,
    make_model,
)

TINY = dict(
    num_layers=1,
    sphere_channels=16,
    attn_hidden_channels=16,
    num_heads=2,
    attn_alpha_channels=4,
    attn_value_channels=4,
    ffn_hidden_channels=16,
    lmax=2,
    mmax=1,
    edge_channels=16,
    num_rbf=32,
    max_num_elements=20,
    cutoff=5.0,
    alpha_drop=0.0,
    drop_path_rate=0.0,
)


def test_all_reference_models_registered():
    names = list_models()
    for expected in [
        "equiformer_v2_qm9",
        "equiformer_v2_oc20",
        "equiformer_v2_matpes",
        "equiformer_v2_matpes_v2",
        "equiformer_v2_matpes_v2_all2all",
        "equiformer_v2_matpes_gata",
        "equiformer_v2_matpes_gatav2",
        "equiformer_v2_matpes_gatav2_no_attn_norm",
        "equiformer_v2_matpes_gatav2_phi_every_layer",
        "equiformer_v2_matpes_gatav2_all2all_phi",
        "equiformer_v2_matpes_gatav2_globalattn_phi",
        "equiformer_v2_matpes_gatav2_htr_global_distance",
        "equiformer_v2_matpes_gatav2_moe",
        "equiformer_v2_matpes_gatav2_dual_stream",
        "equiformer_v2_matpes_gata_esen_ffn",
    ]:
        assert expected in names, expected


@pytest.mark.parametrize(
    "name",
    ["equiformer_v2_matpes_gatav2", "equiformer_v2_matpes_v2_all2all"],
)
def test_registry_models_forward(name):
    rng = np.random.default_rng(0)
    s = GraphSample(
        atomic_numbers=rng.integers(1, 15, size=5).astype(np.int32),
        pos=(rng.normal(size=(5, 3)) * 1.5).astype(np.float32),
        energy=0.0,
        forces=np.zeros((5, 3), np.float32),
    )
    pb = collate([s], 5.0, 20, n_pad=8, e_pad=48)
    b = {k: jnp.asarray(v) for k, v in pb.asdict().items()}
    model = make_model(name, **{**TINY, "grid_resolution": None})
    params = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(params, b)
    assert np.isfinite(np.asarray(out["energy_total"])).all()
    assert count_params(params) > 0
