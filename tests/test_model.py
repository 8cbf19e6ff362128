"""End-to-end model tests: forward smoke, invariance, permutation, padding."""

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

TINY = dict(
    num_targets=3,
    num_layers=2,
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


def make_mols(rng, n_mols=2, n_atoms=6):
    samples = []
    for _ in range(n_mols):
        pos = rng.normal(size=(n_atoms, 3)) * 1.5
        z = rng.integers(1, 9, size=n_atoms)
        samples.append(
            GraphSample(
                atomic_numbers=z.astype(np.int32),
                pos=pos.astype(np.float32),
                y=np.zeros(3, np.float32),
            )
        )
    return samples


def batch_dict(samples, n_pad=16, e_pad=96):
    return {
        k: jnp.asarray(v)
        for k, v in collate(samples, 5.0, 20, n_pad, e_pad).asdict().items()
    }


def test_forward_smoke_and_shapes():
    rng = np.random.default_rng(0)
    b = batch_dict(make_mols(rng))
    model = EquiformerV2QM9(**TINY)
    params = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(params, b)
    assert out.shape == (2, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_rotation_invariance_gate_act():
    """With gate activation (no S2 grids) scalar outputs are exactly invariant."""
    rng = np.random.default_rng(1)
    samples = make_mols(rng)
    model = EquiformerV2QM9(**{**TINY, "use_gate_act": True, "use_sep_s2_act": False})
    b = batch_dict(samples)
    params = model.init(jax.random.PRNGKey(0), b)
    out1 = np.asarray(model.apply(params, b))

    # rotate every molecule by a random rotation
    from test_ops import rotmat_zyz

    Rm = rotmat_zyz(0.3, -1.1, 2.2).astype(np.float32)
    rotated = [
        GraphSample(
            atomic_numbers=s.atomic_numbers, pos=s.pos @ Rm.T, y=s.y
        )
        for s in samples
    ]
    out2 = np.asarray(model.apply(params, batch_dict(rotated)))
    assert np.abs(out1 - out2).max() < 5e-4, np.abs(out1 - out2).max()


def test_rotation_invariance_s2_act_approx():
    rng = np.random.default_rng(2)
    samples = make_mols(rng)
    model = EquiformerV2QM9(**TINY)  # separable S2 (reference default)
    b = batch_dict(samples)
    params = model.init(jax.random.PRNGKey(0), b)
    out1 = np.asarray(model.apply(params, b))
    from test_ops import rotmat_zyz

    Rm = rotmat_zyz(1.0, 0.7, -0.4).astype(np.float32)
    rotated = [
        GraphSample(atomic_numbers=s.atomic_numbers, pos=s.pos @ Rm.T, y=s.y)
        for s in samples
    ]
    out2 = np.asarray(model.apply(params, batch_dict(rotated)))
    scale = np.abs(out1).max() + 1e-6
    assert np.abs(out1 - out2).max() / scale < 0.1


def test_permutation_invariance():
    rng = np.random.default_rng(3)
    samples = make_mols(rng, n_mols=1)
    model = EquiformerV2QM9(**TINY)
    b = batch_dict(samples)
    params = model.init(jax.random.PRNGKey(0), b)
    out1 = np.asarray(model.apply(params, b))

    perm = rng.permutation(samples[0].pos.shape[0])
    permuted = [
        GraphSample(
            atomic_numbers=samples[0].atomic_numbers[perm],
            pos=samples[0].pos[perm],
            y=samples[0].y,
        )
    ]
    out2 = np.asarray(model.apply(params, batch_dict(permuted)))
    assert np.abs(out1 - out2).max() < 5e-4


def test_padding_invariance():
    """More padding must not change the outputs."""
    rng = np.random.default_rng(4)
    samples = make_mols(rng)
    model = EquiformerV2QM9(**TINY)
    b1 = batch_dict(samples, n_pad=16, e_pad=96)
    params = model.init(jax.random.PRNGKey(0), b1)
    out1 = np.asarray(model.apply(params, b1))
    b2 = batch_dict(samples, n_pad=24, e_pad=128)
    out2 = np.asarray(model.apply(params, b2))
    assert np.abs(out1 - out2).max() < 2e-4, np.abs(out1 - out2).max()


def test_scan_layers_invariance():
    """Scanned layer stack: still works and still rotation-invariant."""
    rng = np.random.default_rng(7)
    samples = make_mols(rng)
    model = EquiformerV2QM9(
        **{**TINY, "use_gate_act": True, "use_sep_s2_act": False},
        scan_layers=True,
    )
    b = batch_dict(samples)
    params = model.init(jax.random.PRNGKey(0), b)
    out1 = np.asarray(model.apply(params, b))
    from test_ops import rotmat_zyz

    Rm = rotmat_zyz(0.5, -0.9, 1.1).astype(np.float32)
    rotated = [
        GraphSample(atomic_numbers=s.atomic_numbers, pos=s.pos @ Rm.T, y=s.y)
        for s in samples
    ]
    out2 = np.asarray(model.apply(params, batch_dict(rotated)))
    assert np.abs(out1 - out2).max() < 5e-4
    # params must be stacked along the layer axis
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    assert any(
        "blocks" in "/".join(str(p) for p in path) and leaf.shape[0] == 2
        for path, leaf in flat
    )


def test_gata_forward_smoke():
    rng = np.random.default_rng(5)
    b = batch_dict(make_mols(rng))
    model = EquiformerV2QM9(**TINY)  # baseline
    gata_model_cls = EquiformerV2QM9
    # GATA path exercised through the MatPES model in test_matpes; here just
    # check the flag plumbs through the backbone.
    from equivarianttransformermpnn4quantumcomputations_tpu.models.backbone import (
        EquiformerV2Backbone,
    )

    bb = EquiformerV2Backbone(
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
        gata=True,
    )
    args = (
        b["atomic_numbers"],
        b["pos"],
        b["graph_idx"],
        b["edge_src"],
        b["edge_dst"],
        b["edge_shift"],
        b["edge_mask"],
        b["cell"],
    )
    params = bb.init(jax.random.PRNGKey(0), *args)
    out = bb.apply(params, *args)
    assert np.isfinite(np.asarray(out.x)).all()
