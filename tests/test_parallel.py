"""Data-parallel tests on an 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equivarianttransformermpnn4quantumcomputations_tpu.data.graph import (
    GraphSample,
    collate,
)
from equivarianttransformermpnn4quantumcomputations_tpu.models.qm9 import (
    EquiformerV2QM9,
)
from equivarianttransformermpnn4quantumcomputations_tpu.parallel.data_parallel import (
    make_mesh,
    make_qm9_dp_step,
    shard_batch,
    stack_microbatches,
)
from equivarianttransformermpnn4quantumcomputations_tpu.train.schedules import (
    warmup_cosine,
)
from equivarianttransformermpnn4quantumcomputations_tpu.train.trainer import (
    create_train_state,
    make_optimizer,
)

TINY = dict(
    num_targets=2,
    num_layers=1,
    sphere_channels=8,
    attn_hidden_channels=8,
    num_heads=2,
    attn_alpha_channels=4,
    attn_value_channels=4,
    ffn_hidden_channels=8,
    lmax=2,
    mmax=1,
    edge_channels=8,
    num_rbf=16,
    max_num_elements=10,
    alpha_drop=0.0,
    drop_path_rate=0.0,
)


def micro_batch(rng, seed_y=0.0):
    samples = []
    for _ in range(2):
        pos = rng.normal(size=(5, 3)) * 1.5
        z = rng.integers(1, 9, size=5)
        samples.append(
            GraphSample(
                atomic_numbers=z.astype(np.int32),
                pos=pos.astype(np.float32),
                y=(rng.normal(size=2) + seed_y).astype(np.float32),
            )
        )
    return collate(samples, 5.0, 20, n_pad=12, e_pad=48).asdict()


@pytest.mark.slow     # subsumed by test_dp_matches_single_device_grads
def test_dp_step_runs_on_8_devices():
    assert jax.device_count() >= 8, jax.devices()
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    stacked = stack_microbatches([micro_batch(rng) for _ in range(8)])
    batch = shard_batch(mesh, stacked)

    model = EquiformerV2QM9(**TINY)
    single = {k: jnp.asarray(v[0]) for k, v in stacked.items()}
    params = model.init(jax.random.PRNGKey(0), single)
    tx = make_optimizer(warmup_cosine(1e-3, 10, 100), weight_decay=1e-3)
    state = create_train_state(params, tx)

    dp_step = make_qm9_dp_step(model, tx, mesh)
    # snapshot before the step: state is donated into dp_step
    p0 = np.asarray(jax.tree_util.tree_leaves(params)[0]).copy()
    state2, metrics = dp_step(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    p1 = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
    assert not np.allclose(p0, p1)


@pytest.mark.slow
def test_oc20_explicit_force_dp_matches_single_device():
    """OC20 DP (explicit force head) on the 8-device mesh == single-device
    (VERDICT r1 #8)."""
    from equivarianttransformermpnn4quantumcomputations_tpu.models.oc20 import (
        EquiformerV2OC20,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.parallel.data_parallel import (
        make_oc20_dp_step,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.train.trainer import (
        TrainState,
        ema_update,
        oc20_loss,
    )
    import optax

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    samples = []
    for _ in range(2):
        n = 5
        cell = (np.eye(3) * 5.0).astype(np.float32)
        pos = (rng.uniform(0, 1, size=(n, 3)) @ cell).astype(np.float32)
        samples.append(
            GraphSample(
                atomic_numbers=rng.integers(1, 9, size=n).astype(np.int32),
                pos=pos, cell=cell, pbc=True,
                energy=float(rng.normal()),
                forces=rng.normal(size=(n, 3)).astype(np.float32),
            )
        )
    mb = collate(samples, 5.0, 20, n_pad=12, e_pad=512).asdict()
    stacked = stack_microbatches([mb] * 8)
    batch = shard_batch(mesh, stacked)

    kw = {k: v for k, v in TINY.items() if k != "num_targets"}
    model = EquiformerV2OC20(**kw, regress_forces=True)
    single = {k: jnp.asarray(v) for k, v in mb.items()}
    params = model.init(jax.random.PRNGKey(0), single)
    tx = make_optimizer(warmup_cosine(1e-3, 10, 100))
    state = create_train_state(params, tx)

    def sd_step(state, b, rng):
        def loss_fn(p):
            out = model.apply(p, b, deterministic=False, rngs={"dropout": rng})
            return oc20_loss(
                out["energy"], b["energy"], out["forces"], b["forces"],
                b["node_mask"],
            )

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params),
        ), {"loss": loss}

    key = jax.random.PRNGKey(4)
    s_sd, m_sd = jax.jit(sd_step)(state, single, key)
    dp_step = make_oc20_dp_step(model, tx, mesh)
    s_dp, m_dp = dp_step(state, batch, key)
    assert np.allclose(float(m_sd["loss"]), float(m_dp["loss"]), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_sd.params),
        jax.tree_util.tree_leaves(s_dp.params),
    ):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_matpes_gata_grad_of_grad_dp_matches_single_device():
    """Flagship MatPES-GATA force-training (grad-of-grad) DP step on the
    8-device mesh == single-device (VERDICT r1 #8)."""
    from equivarianttransformermpnn4quantumcomputations_tpu.models.matpes import (
        EquiformerV2MatPES,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.parallel.data_parallel import (
        make_matpes_dp_step,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.train.trainer import (
        make_matpes_train_step,
    )

    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    n = 4
    cell = (np.eye(3) * 4.0 + rng.normal(size=(3, 3)) * 0.1).astype(np.float32)
    pos = (rng.uniform(0, 1, size=(n, 3)) @ cell).astype(np.float32)
    s = GraphSample(
        atomic_numbers=rng.integers(1, 9, size=n).astype(np.int32),
        pos=pos, cell=cell, pbc=True,
        energy=float(rng.normal()),
        forces=rng.normal(size=(n, 3)).astype(np.float32),
    )
    mb = collate([s], 5.0, 12, n_pad=6, e_pad=220).asdict()
    stacked = stack_microbatches([mb] * 8)
    batch = shard_batch(mesh, stacked)

    kw = {k: v for k, v in TINY.items() if k != "num_targets"}
    model = EquiformerV2MatPES(
        **kw, grid_resolution=None, gata=True,
    )
    single = {k: jnp.asarray(v) for k, v in mb.items()}
    params = model.init(jax.random.PRNGKey(0), single)
    tx = make_optimizer(warmup_cosine(1e-3, 10, 100))
    state = create_train_state(params, tx)

    sd_step = jax.jit(
        make_matpes_train_step(model, tx, w_energy=1.0, w_force=1.0)
    )
    dp_step = make_matpes_dp_step(
        model, tx, mesh, w_energy=1.0, w_force=1.0
    )
    key = jax.random.PRNGKey(6)
    s_sd, m_sd = sd_step(state, single, key)
    s_dp, m_dp = dp_step(state, batch, key)
    assert np.allclose(float(m_sd["loss"]), float(m_dp["loss"]), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_sd.params),
        jax.tree_util.tree_leaves(s_dp.params),
    ):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_matches_single_device_grads():
    """8 identical micro-batches -> DP update == single-device update."""
    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    mb = micro_batch(rng)
    stacked = stack_microbatches([mb] * 8)
    batch = shard_batch(mesh, stacked)

    model = EquiformerV2QM9(**TINY)
    single = {k: jnp.asarray(v) for k, v in mb.items()}
    params = model.init(jax.random.PRNGKey(0), single)
    tx = make_optimizer(warmup_cosine(1e-3, 10, 100))
    state = create_train_state(params, tx)

    from equivarianttransformermpnn4quantumcomputations_tpu.train.trainer import (
        make_qm9_train_step,
    )

    sd_step = jax.jit(make_qm9_train_step(model, tx))
    dp_step = make_qm9_dp_step(model, tx, mesh)

    key = jax.random.PRNGKey(2)
    s_sd, m_sd = sd_step(state, single, key)
    # dp uses split rngs per device; with dropout off results must match
    s_dp, m_dp = dp_step(state, batch, key)
    assert np.allclose(float(m_sd["loss"]), float(m_dp["loss"]), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_sd.params),
        jax.tree_util.tree_leaves(s_dp.params),
    ):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
