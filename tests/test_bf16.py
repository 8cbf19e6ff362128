"""Mixed-precision (bf16 compute / f32 master) tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from equivarianttransformermpnn4quantumcomputations_tpu.data.graph import (
    GraphSample,
    collate,
)
from equivarianttransformermpnn4quantumcomputations_tpu.models.matpes import (
    EquiformerV2MatPES,
)
from equivarianttransformermpnn4quantumcomputations_tpu.train.schedules import (
    warmup_cosine,
)
from equivarianttransformermpnn4quantumcomputations_tpu.train.trainer import (
    cast_params,
    create_train_state,
    make_matpes_train_step,
    make_optimizer,
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


def batch(rng):
    s = GraphSample(
        atomic_numbers=rng.integers(1, 15, size=6).astype(np.int32),
        pos=(rng.normal(size=(6, 3)) * 1.5).astype(np.float32),
        energy=0.1,
        forces=np.zeros((6, 3), np.float32),
    )
    pb = collate([s], 5.0, 20, n_pad=8, e_pad=64)
    return {k: jnp.asarray(v) for k, v in pb.asdict().items()}


def test_bf16_forward_close_to_f32():
    rng = np.random.default_rng(0)
    b = batch(rng)
    m32 = EquiformerV2MatPES(**TINY, compute_dtype="float32")
    m16 = EquiformerV2MatPES(**TINY, compute_dtype="bfloat16")
    params = m32.init(jax.random.PRNGKey(0), b)
    e32 = np.asarray(m32.apply(params, b)["energy_total"])
    e16 = np.asarray(
        m16.apply(cast_params(params, jnp.bfloat16), b)["energy_total"]
    )
    scale = max(abs(e32).max(), 1.0)
    assert abs(e32 - e16).max() / scale < 0.05, (e32, e16)


@pytest.mark.slow
def test_bf16_train_step_finite_and_f32_grads():
    rng = np.random.default_rng(1)
    b = batch(rng)
    model = EquiformerV2MatPES(**TINY, compute_dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(0), b)
    # master params stay f32
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(params)
        if jnp.issubdtype(leaf.dtype, jnp.floating)
    )
    tx = make_optimizer(warmup_cosine(1e-3, 5, 50))
    state = create_train_state(params, tx)
    step = jax.jit(
        make_matpes_train_step(model, tx, mixed_precision=True),
        donate_argnums=(0,),
    )
    state, metrics = step(state, b, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(state.params)
        if jnp.issubdtype(leaf.dtype, jnp.floating)
    )
