"""Graph-uniform blocking: blocked segment ops == flat, model outputs match.

The uniform layout (collate(uniform=True) + model uniform_blocks=True) makes
every one-hot segment reduction block-diagonal — FLOPs linear instead of
quadratic in batch size (the PERF.md batch-16 regression fix).  Parameters
and per-graph results must be identical to the packed layout.
"""

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
    matpes_energy_forces_stress,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.pallas.segsum import (
    gather_nodes,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.segment import (
    segment_sum,
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


def test_blocked_segment_sum_matches_flat():
    rng = np.random.default_rng(0)
    B, n_max, e_max, D = 3, 4, 6, 5
    ids = np.concatenate(
        [rng.integers(b * n_max, (b + 1) * n_max, e_max) for b in range(B)]
    ).astype(np.int32)
    vals = rng.normal(size=(B * e_max, D)).astype(np.float32)
    mask = rng.random(B * e_max) > 0.2
    flat = np.asarray(
        segment_sum(jnp.asarray(vals), jnp.asarray(ids), B * n_max,
                    mask=jnp.asarray(mask))
    )
    blk = np.asarray(
        segment_sum(jnp.asarray(vals), jnp.asarray(ids), B * n_max,
                    mask=jnp.asarray(mask), blocks=(B, n_max, e_max))
    )
    assert np.abs(flat - blk).max() < 1e-5


def test_blocked_gather_grad_of_grad_matches_flat():
    """gather_nodes with blocks: value + 1st + 2nd order match flat."""
    rng = np.random.default_rng(1)
    B, n_max, e_max, D = 2, 4, 5, 3
    ids = np.concatenate(
        [rng.integers(b * n_max, (b + 1) * n_max, e_max) for b in range(B)]
    ).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(B * n_max, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D,)), jnp.float32)

    def make(blocks):
        def energy(xx):
            g = gather_nodes(xx, jnp.asarray(ids), blocks=blocks)
            return jnp.sum(jnp.sin(g) @ w)

        def loss(xx):
            f = jax.grad(energy)(xx)
            return jnp.sum(f ** 2)

        return energy, jax.grad(energy), jax.grad(loss)

    for fn_f, fn_b in zip(make(None), make((B, n_max, e_max))):
        a, b = np.asarray(fn_f(x)), np.asarray(fn_b(x))
        assert np.abs(a - b).max() < 1e-5


def crystals(rng, ns):
    out = []
    for n in ns:
        cell = (np.eye(3) * 4.0 + rng.normal(size=(3, 3)) * 0.1).astype(
            np.float32
        )
        pos = (rng.uniform(0, 1, size=(n, 3)) @ cell).astype(np.float32)
        out.append(
            GraphSample(
                atomic_numbers=rng.integers(1, 15, size=n).astype(np.int32),
                pos=pos, cell=cell, pbc=True,
                energy=0.0, forces=np.zeros((n, 3), np.float32),
            )
        )
    return out


@pytest.mark.slow
def test_uniform_model_matches_packed():
    """Same graphs + params: uniform-blocked model == packed model
    (energies per graph and forces per real atom)."""
    rng = np.random.default_rng(2)
    samples = crystals(rng, [4, 3, 4])
    kw = dict(cutoff=5.0, max_neighbors=12)
    b_packed = {
        k: jnp.asarray(v)
        for k, v in collate(samples, **kw, n_pad=12, e_pad=720)
        .asdict().items()
    }
    b_uni = {
        k: jnp.asarray(v)
        for k, v in collate(samples, **kw, n_pad=15, e_pad=750, uniform=True)
        .asdict().items()
    }
    m_packed = EquiformerV2MatPES(**TINY)
    m_uni = EquiformerV2MatPES(**TINY, uniform_blocks=True)
    params = m_packed.init(jax.random.PRNGKey(0), b_packed)

    out_p = matpes_energy_forces_stress(m_packed, params, b_packed)
    out_u = matpes_energy_forces_stress(m_uni, params, b_uni)

    e_p = np.asarray(out_p["energy_total"])
    e_u = np.asarray(out_u["energy_total"])
    assert np.abs(e_p - e_u).max() < 1e-4, (e_p, e_u)

    # forces per real atom: gather via masks from both layouts
    mp = np.asarray(b_packed["node_mask"])
    mu = np.asarray(b_uni["node_mask"])
    f_p = np.asarray(out_p["forces"])[mp]
    f_u = np.asarray(out_u["forces"])[mu]
    # same graph order so flattened real-atom order matches
    assert f_p.shape == f_u.shape
    assert np.abs(f_p - f_u).max() < 1e-4


def test_blocked_segment_softmax_matches_flat():
    from equivarianttransformermpnn4quantumcomputations_tpu.ops.segment import (
        segment_softmax,
    )

    rng = np.random.default_rng(3)
    B, n_max, e_max, H = 3, 4, 6, 2
    ids = np.concatenate(
        [rng.integers(b * n_max, (b + 1) * n_max, e_max) for b in range(B)]
    ).astype(np.int32)
    logits = rng.normal(size=(B * e_max, H)).astype(np.float32) * 3
    mask = rng.random(B * e_max) > 0.3
    flat = np.asarray(
        segment_softmax(jnp.asarray(logits), jnp.asarray(ids), B * n_max,
                        mask=jnp.asarray(mask))
    )
    blk = np.asarray(
        segment_softmax(jnp.asarray(logits), jnp.asarray(ids), B * n_max,
                        mask=jnp.asarray(mask), blocks=(B, n_max, e_max))
    )
    assert np.abs(flat - blk).max() < 1e-6

    # gradient parity too (softmax backward is part of the hot path)
    def loss(fn_blocks):
        def f(lg):
            w = segment_softmax(
                lg, jnp.asarray(ids), B * n_max, mask=jnp.asarray(mask),
                blocks=fn_blocks,
            )
            return jnp.sum(jnp.sin(w * 3.0))

        return np.asarray(jax.grad(f)(jnp.asarray(logits)))

    g_flat, g_blk = loss(None), loss((B, n_max, e_max))
    assert np.abs(g_flat - g_blk).max() < 1e-6
