"""Serving API: checkpoint -> Predictor -> energies/forces."""

import numpy as np
import jax
import jax.numpy as jnp

from equivarianttransformermpnn4quantumcomputations_tpu.data.graph import (
    GraphSample,
    collate,
)
from equivarianttransformermpnn4quantumcomputations_tpu.inference import Predictor
from equivarianttransformermpnn4quantumcomputations_tpu.models.matpes import (
    EquiformerV2MatPES,
)
from equivarianttransformermpnn4quantumcomputations_tpu.train.checkpoint import (
    CheckpointManager,
)
from equivarianttransformermpnn4quantumcomputations_tpu.train.schedules import (
    warmup_cosine,
)
from equivarianttransformermpnn4quantumcomputations_tpu.train.trainer import (
    create_train_state,
    make_optimizer,
)

CFG = dict(
    num_layers=1,
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
    avg_degree=6.0,
    gata=True,
)


def test_predictor_roundtrip(tmp_path):
    model = EquiformerV2MatPES(
        **CFG, alpha_drop=0.0, drop_path_rate=0.0
    )
    rng = np.random.default_rng(0)
    s = GraphSample(
        atomic_numbers=np.array([1, 6, 8, 8], np.int32),
        pos=(rng.normal(size=(4, 3)) * 1.5).astype(np.float32),
    )
    pb = collate([s], 5.0, 20, 8, 64)
    fb = {k: jnp.asarray(v) for k, v in pb.asdict().items()}
    params = model.init(jax.random.PRNGKey(0), fb)
    tx = make_optimizer(warmup_cosine(1e-3, 1, 2))
    state = create_train_state(params, tx)
    mgr = CheckpointManager(
        str(tmp_path),
        {**CFG, "max_neighbors": 20, "energy_mean": 0.5, "energy_std": 2.0},
    )
    mgr.save_best(state)

    p = Predictor.from_checkpoint(str(tmp_path), "ckpt_best")
    out = p.predict(s.atomic_numbers, s.pos)
    assert np.isfinite(out["energy"])
    assert out["forces"].shape == (4, 3)
    # denormalization applied: energy = per_atom * std + mean times natoms
    assert np.isclose(
        out["energy"], out["energy_per_atom"] * 4, rtol=1e-5
    )

    # batched call with different sizes
    s2 = GraphSample(
        atomic_numbers=np.array([1, 1, 6], np.int32),
        pos=(rng.normal(size=(3, 3)) * 1.5).astype(np.float32),
    )
    outs = p.predict_batch(
        [
            dict(atomic_numbers=s.atomic_numbers, positions=s.pos),
            dict(atomic_numbers=s2.atomic_numbers, positions=s2.pos),
        ]
    )
    assert outs["energy"].shape == (2,)
    assert outs["forces"][0].shape == (4, 3)
    assert outs["forces"][1].shape == (3, 3)
