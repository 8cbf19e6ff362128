"""GATA v1 (Gotennet_inspired fork) + eSEN gated-SH FFN variant tests.

Reference: models/NewFunctions/Gotennet_inspired/ (v1) and
models/NewFunctions/GATA_and_all2all_escninsipred_envelope_and_simple_gating_
toreplace_S2activation/ (eSEN FFN).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equivarianttransformermpnn4quantumcomputations_tpu.data.graph import (
    GraphSample,
    collate,
)
from equivarianttransformermpnn4quantumcomputations_tpu.models.matpes import (
    EquiformerV2MatPES,
    matpes_energy_forces_stress,
)
from equivarianttransformermpnn4quantumcomputations_tpu.models.registry import (
    make_model,
)
from equivarianttransformermpnn4quantumcomputations_tpu.nn.ffn import (
    ESENFeedForward,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops import wigner_np as W

TINY_V1 = dict(
    num_layers=2,
    sphere_channels=16,
    attn_hidden_channels=16,   # v1 requires == sphere_channels
    num_heads=2,
    attn_alpha_channels=4,
    attn_value_channels=4,
    ffn_hidden_channels=16,
    lmax=2,
    mmax=2,                    # v1 requires mmax == lmax
    grid_resolution=None,
    edge_channels=16,
    num_rbf=32,
    max_num_elements=20,
    cutoff=5.0,
    alpha_drop=0.0,
    drop_path_rate=0.0,
    gata=False,
    gata_v1=True,
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


def test_gata_v1_forward_and_forces():
    rng = np.random.default_rng(0)
    b = batch(rng)
    model = EquiformerV2MatPES(**TINY_V1)
    params = model.init(jax.random.PRNGKey(0), b)
    out = matpes_energy_forces_stress(model, params, b)
    assert np.isfinite(np.asarray(out["energy_total"])).all()
    assert np.isfinite(np.asarray(out["forces"])).all()
    # v1 has no t_ij stream: no HTR or W_rs params anywhere
    names = jax.tree_util.tree_map_with_path(lambda p, _: p, params)
    flat = [
        "/".join(str(k) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    ]
    assert not any("htr" in f or "W_rs" in f for f in flat), flat[:5]
    # but the value-act gate width is S = 1 + 2*lmax chunks wide: so2_conv_1's
    # m=0 output carries alpha + S*hidden extras (checked indirectly by the
    # forward succeeding at full (lmax+1)^2 value width)


def test_gata_v1_requires_mmax_eq_lmax():
    rng = np.random.default_rng(1)
    b = batch(rng)
    model = EquiformerV2MatPES(**{**TINY_V1, "mmax": 1})
    with pytest.raises(ValueError, match="mmax == lmax"):
        model.init(jax.random.PRNGKey(0), b)


def test_gata_v1_requires_hidden_eq_sphere():
    rng = np.random.default_rng(2)
    b = batch(rng)
    model = EquiformerV2MatPES(**{**TINY_V1, "attn_hidden_channels": 32})
    with pytest.raises(ValueError, match="sphere_channels"):
        model.init(jax.random.PRNGKey(0), b)


def test_gata_v1_registry_preset():
    from equivarianttransformermpnn4quantumcomputations_tpu.models.registry import (
        get_model,
    )

    cls, overrides = get_model("equiformer_v2_matpes_gata")
    assert overrides["gata_v1"] is True and overrides["gata"] is False
    # reference config runs lmax=mmax=4 (config_cosinelearningGATA.py:109-110)
    assert overrides["mmax"] == 4


def test_esen_ffn_exact_equivariance():
    """Rotating the input coefficients by block-diag Wigner-D rotates the
    output identically — the eSEN FFN never leaves SH space (no aliasing)."""
    lmax, C = 3, 8
    rng = np.random.default_rng(3)
    x = rng.normal(size=(5, (lmax + 1) ** 2, C)).astype(np.float64)

    a, be, g = 0.7, -1.1, 0.4
    import scipy.linalg as sl

    D = sl.block_diag(
        *[W.real_wigner_D_angles(l, a, be, g) for l in range(lmax + 1)]
    )

    ffn = ESENFeedForward(
        sphere_channels=C, hidden_channels=16, output_channels=C, lmax=lmax
    )
    params = ffn.init(jax.random.PRNGKey(0), jnp.asarray(x, jnp.float32))
    y = np.asarray(ffn.apply(params, jnp.asarray(x, jnp.float32)))
    y_rot_in = np.asarray(
        ffn.apply(params, jnp.asarray(D @ x, jnp.float32))
    )
    assert np.abs(y_rot_in - D @ y).max() < 1e-5


def test_esen_ffn_gates_start_open():
    """Gate projections init to weight=0/bias=2 -> sigmoid(2)~0.88: at init
    the FFN must NOT kill higher-l features (reference :436-443)."""
    lmax, C = 2, 8
    rng = np.random.default_rng(4)
    x = rng.normal(size=(4, (lmax + 1) ** 2, C)).astype(np.float32)
    ffn = ESENFeedForward(
        sphere_channels=C, hidden_channels=16, output_channels=C, lmax=lmax
    )
    params = ffn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    gp = params["params"]["gate_proj_1"]
    assert np.all(np.asarray(gp["kernel"]) == 0.0)
    assert np.all(np.asarray(gp["bias"]) == 2.0)
    y = np.asarray(ffn.apply(params, jnp.asarray(x)))
    # higher-l output present (not gated to ~0)
    assert np.abs(y[:, 1:, :]).max() > 1e-3


@pytest.mark.slow
def test_esen_model_forward_and_grad():
    rng = np.random.default_rng(5)
    b = batch(rng)
    model = make_model(
        "equiformer_v2_matpes_gata_esen_ffn",
        **{k: v for k, v in TINY_V1.items() if k not in ("gata", "gata_v1", "mmax")},
        mmax=1,
    )
    params = model.init(jax.random.PRNGKey(0), b)
    out = matpes_energy_forces_stress(model, params, b)
    assert np.isfinite(np.asarray(out["energy_total"])).all()
    assert np.isfinite(np.asarray(out["forces"])).all()

    def loss(p):
        o = matpes_energy_forces_stress(model, p, b)
        return jnp.sum(o["energy_total"] ** 2) + jnp.sum(o["forces"] ** 2)

    g = jax.grad(loss)(params)
    gmax = max(
        float(jnp.abs(v).max()) for v in jax.tree_util.tree_leaves(g)
    )
    assert np.isfinite(gmax) and gmax > 0.0
