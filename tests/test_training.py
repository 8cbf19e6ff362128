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


# ── single-reduction clip + non-finite guard (trainer._guarded_clip_adamw) ──


def _tiny_params():
    return {
        "dense": {"kernel": jnp.ones((4, 4), jnp.float32) * 0.1,
                  "bias": jnp.zeros((4,), jnp.float32)},
        "embed": {"weight": jnp.ones((3, 4), jnp.float32)},
    }


def test_guarded_optimizer_matches_reference_stack_on_finite_grads():
    """The fused clip+guard must produce the same updates and the same state
    PYTREE STRUCTURE as apply_if_finite(chain(clip_by_global_norm, adamw)) —
    structure equality keeps old orbax checkpoints restorable."""
    import optax

    from equivarianttransformermpnn4quantumcomputations_tpu.train.trainer import (
        _wd_mask,
    )

    params = _tiny_params()
    sched = lambda step: 1e-3
    tx_new = make_optimizer(sched, weight_decay=1e-2)
    tx_ref = optax.apply_if_finite(
        optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(sched, weight_decay=1e-2, mask=_wd_mask),
        ),
        max_consecutive_errors=1_000_000,
    )
    s_new, s_ref = tx_new.init(params), tx_ref.init(params)
    assert (jax.tree_util.tree_structure(s_new)
            == jax.tree_util.tree_structure(s_ref))

    # same updates as the unfused stack (big grads so the clip engages)
    grads = jax.tree_util.tree_map(lambda p: 3.0 * jnp.ones_like(p), params)
    u_new, _ = tx_new.update(grads, s_new, params)
    u_ref, _ = tx_ref.update(grads, s_ref, params)
    for a, b in zip(jax.tree_util.tree_leaves(u_new),
                    jax.tree_util.tree_leaves(u_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_guarded_optimizer_skips_nonfinite_and_freezes_state():
    params = _tiny_params()
    tx = make_optimizer(lambda step: 1e-3, weight_decay=0.0)
    state0 = tx.init(params)

    bad = jax.tree_util.tree_map(lambda p: jnp.full_like(p, jnp.nan), params)
    updates, state1 = tx.update(bad, state0, params)
    # update is a no-op and the adam moments are untouched
    assert all(np.all(np.asarray(u) == 0.0)
               for u in jax.tree_util.tree_leaves(updates))
    for a, b in zip(jax.tree_util.tree_leaves(state0.inner_state),
                    jax.tree_util.tree_leaves(state1.inner_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state1.notfinite_count) == 1
    assert int(state1.total_notfinite) == 1
    assert not bool(state1.last_finite)

    # an inf leaf is also rejected (inf propagates through the global norm)
    bad_inf = dict(_tiny_params())
    bad_inf["dense"] = dict(bad_inf["dense"])
    bad_inf["dense"]["kernel"] = jnp.full((4, 4), jnp.inf)
    updates, state2 = tx.update(bad_inf, state1, params)
    assert all(np.all(np.asarray(u) == 0.0)
               for u in jax.tree_util.tree_leaves(updates))
    assert int(state2.notfinite_count) == 2

    # a good step afterwards applies and resets the consecutive counter
    good = jax.tree_util.tree_map(lambda p: 0.01 * jnp.ones_like(p), params)
    updates, state3 = tx.update(good, state2, params)
    assert any(np.any(np.asarray(u) != 0.0)
               for u in jax.tree_util.tree_leaves(updates))
    assert int(state3.notfinite_count) == 0
    assert int(state3.total_notfinite) == 2
    assert bool(state3.last_finite)
