"""Integration tests: training loop components learn on synthetic data,
checkpoints round-trip, loader prefetch works."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from equivarianttransformermpnn4quantumcomputations_tpu.data.loader import (
    PaddedLoader,
    infer_pad_sizes,
)
from equivarianttransformermpnn4quantumcomputations_tpu.data.synthetic import (
    SyntheticMolecules,
)
from equivarianttransformermpnn4quantumcomputations_tpu.models.qm9 import (
    EquiformerV2QM9,
)
from equivarianttransformermpnn4quantumcomputations_tpu.train.schedules import (
    warmup_cosine,
)
from equivarianttransformermpnn4quantumcomputations_tpu.train.trainer import (
    create_train_state,
    make_optimizer,
    make_qm9_train_step,
)

TINY = dict(
    num_targets=1,
    num_layers=2,
    sphere_channels=16,
    attn_hidden_channels=16,
    num_heads=2,
    attn_alpha_channels=4,
    attn_value_channels=4,
    ffn_hidden_channels=32,
    lmax=2,
    mmax=1,
    edge_channels=16,
    num_rbf=32,
    max_num_elements=10,
    cutoff=4.0,
    alpha_drop=0.0,
    drop_path_rate=0.0,
)


@pytest.mark.slow
def test_qm9_training_reduces_loss(tmp_path):
    ds = SyntheticMolecules(n_samples=32, n_atoms=6, targets=1)
    n_pad, e_pad = infer_pad_sizes(ds, 4.0, 12, batch_size=8)
    loader = PaddedLoader(ds, 8, 4.0, 12, n_pad, e_pad, shuffle=True, prefetch=2)

    model = EquiformerV2QM9(**TINY)
    tx = make_optimizer(warmup_cosine(2e-3, 5, 200), weight_decay=0.0)
    first = next(iter(loader))
    fb = {k: jnp.asarray(v) for k, v in first.asdict().items()}
    params = model.init(jax.random.PRNGKey(0), fb)
    state = create_train_state(params, tx)
    step = jax.jit(make_qm9_train_step(model, tx), donate_argnums=(0,))

    losses = []
    rng = jax.random.PRNGKey(1)
    for epoch in range(12):
        loader.set_epoch(epoch)
        for pb in loader:
            b = {k: jnp.asarray(v) for k, v in pb.asdict().items()}
            rng, sub = jax.random.split(rng)
            state, m = step(state, b, sub)
            losses.append(float(m["loss"]))
    first_avg = np.mean(losses[:4])
    last_avg = np.mean(losses[-4:])
    assert last_avg < 0.7 * first_avg, (first_avg, last_avg)


def test_checkpoint_roundtrip(tmp_path):
    from equivarianttransformermpnn4quantumcomputations_tpu.train.checkpoint import (
        CheckpointManager,
    )

    ds = SyntheticMolecules(n_samples=8, n_atoms=5, targets=1)
    loader = PaddedLoader(ds, 4, 4.0, 12, 24, 128)
    model = EquiformerV2QM9(**TINY)
    tx = make_optimizer(warmup_cosine(1e-3, 5, 100))
    fb = {
        k: jnp.asarray(v) for k, v in next(iter(loader)).asdict().items()
    }
    params = model.init(jax.random.PRNGKey(0), fb)
    state = create_train_state(params, tx)
    step = jax.jit(make_qm9_train_step(model, tx))
    state, _ = step(state, fb, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path), {"lmax": 2})
    mgr.save_best(state, {"epoch": 0, "val": 1.0})
    state0 = create_train_state(params, tx)
    restored, meta = mgr.restore("ckpt_best", state0)
    assert meta["config"]["lmax"] == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        assert np.allclose(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1

    # periodic rotation keeps only last 2
    for ep in range(4):
        mgr.save_periodic(ep, state)
    kept = sorted(
        d for d in os.listdir(tmp_path) if d.startswith("ckpt_epoch_")
        and not d.endswith(".json")
    )
    assert kept == ["ckpt_epoch_00002", "ckpt_epoch_00003"]


def test_init_params_host_matches_device_init():
    """init_params_host (CPU-side init + device_put, trainer.py) produces the
    same tree/shapes/values as a plain model.init — the TPU fast-init path."""
    from equivarianttransformermpnn4quantumcomputations_tpu.train.trainer import (
        init_params_host,
    )

    ds = SyntheticMolecules(n_samples=8, n_atoms=6, targets=1)
    n_pad, e_pad = infer_pad_sizes(ds, 4.0, 12, batch_size=4)
    loader = PaddedLoader(ds, 4, 4.0, 12, n_pad, e_pad)
    model = EquiformerV2QM9(**TINY)
    fb = {k: jnp.asarray(v) for k, v in next(iter(loader)).asdict().items()}
    p_host = init_params_host(model, jax.random.PRNGKey(0), fb)
    p_dev = model.init(jax.random.PRNGKey(0), fb)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0
        ),
        p_host, p_dev,
    )
