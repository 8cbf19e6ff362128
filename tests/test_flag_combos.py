"""Reference flag combinations: forward + one grad step each."""

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
from equivarianttransformermpnn4quantumcomputations_tpu.train.schedules import (
    warmup_cosine,
)
from equivarianttransformermpnn4quantumcomputations_tpu.train.trainer import (
    create_train_state,
    make_optimizer,
    make_qm9_train_step,
)

TINY = dict(
    num_targets=2,
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
    max_num_elements=10,
    cutoff=5.0,
    alpha_drop=0.0,
    drop_path_rate=0.0,
)


def batch(rng):
    samples = [
        GraphSample(
            atomic_numbers=rng.integers(1, 9, size=5).astype(np.int32),
            pos=(rng.normal(size=(5, 3)) * 1.5).astype(np.float32),
            y=rng.normal(size=2).astype(np.float32),
        )
        for _ in range(2)
    ]
    pb = collate(samples, 5.0, 20, n_pad=12, e_pad=64)
    return {k: jnp.asarray(v) for k, v in pb.asdict().items()}


@pytest.mark.parametrize(
    "kw",
    [
        # default tier: one per structurally distinct path; the rest are
        # slow-tier permutations (ETQ_RUN_SLOW=1)
        # grid-MLP FFN (reference use_grid_mlp=True path)
        {"use_grid_mlp": True},
        pytest.param({"use_grid_mlp": True, "use_sep_s2_act": False},
                     marks=pytest.mark.slow),
        # alternate norm types (reference layer_norm / layer_norm_sh)
        {"norm_type": "layer_norm"},
        pytest.param({"norm_type": "layer_norm_sh"},
                     marks=pytest.mark.slow),
        # m-share radial weights (reference use_m_share_rad)
        pytest.param({"use_m_share_rad": True}, marks=pytest.mark.slow),
        # no attention renorm / no atom edge embedding / shared embedding
        pytest.param({"use_attn_renorm": False}, marks=pytest.mark.slow),
        pytest.param({"use_atom_edge_embedding": False},
                     marks=pytest.mark.slow),
        pytest.param({"share_atom_edge_embedding": True},
                     marks=pytest.mark.slow),
        # dropout paths active (training mode)
        {"alpha_drop": 0.2, "drop_path_rate": 0.2, "proj_drop": 0.2},
    ],
)
def test_flag_combo_trains(kw):
    rng = np.random.default_rng(0)
    b = batch(rng)
    model = EquiformerV2QM9(**{**TINY, **kw})
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(9)}, b
    )
    tx = make_optimizer(warmup_cosine(1e-3, 5, 50), weight_decay=1e-4)
    state = create_train_state(params, tx)
    step = jax.jit(make_qm9_train_step(model, tx), donate_argnums=(0,))
    state, m = step(state, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"])), kw
