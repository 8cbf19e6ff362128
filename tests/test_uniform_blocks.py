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


# ── fixed-degree layout (collate(fixed_degree=True)) ───────────────────────


def test_fixed_degree_collate_canonical_pattern():
    """Edge slot e belongs to dst node e // k; masked slots self-referent."""
    rng = np.random.default_rng(4)
    samples = crystals(rng, [4, 3])
    pb = collate(samples, 5.0, 8, n_pad=10, e_pad=80, fixed_degree=True)
    k = 8
    canon = np.repeat(np.arange(10), k)
    assert np.array_equal(pb.edge_dst, canon)
    # real edges of node n occupy that node's slots
    em = pb.edge_mask.reshape(10, k)
    # graph 0 has 4 real atoms of 5 slots; padding node rows are all-masked
    assert not em[4].any()
    # each real node's dvec set equals the packed layout's for that node
    pb2 = collate(samples, 5.0, 8, n_pad=10, e_pad=80, uniform=True)
    for n in range(10):
        mine = set(
            map(tuple, np.c_[pb.edge_src, pb.edge_shift][
                (pb.edge_dst == n) & pb.edge_mask
            ])
        )
        theirs = set(
            map(tuple, np.c_[pb2.edge_src, pb2.edge_shift][
                (pb2.edge_dst == n) & pb2.edge_mask
            ])
        )
        assert mine == theirs, n


def test_fixed_degree_segment_ops_match_generic():
    """fixed_dst reshape-reductions == generic segment ops (incl. grads)."""
    from equivarianttransformermpnn4quantumcomputations_tpu.ops.segment import (
        segment_mean,
        segment_softmax,
    )

    rng = np.random.default_rng(5)
    B, n_max, k, H = 2, 4, 3, 5
    e_max = n_max * k
    N, E = B * n_max, B * n_max * k
    blocks4 = (B, n_max, e_max, k)
    ids = jnp.asarray(np.repeat(np.arange(N), k).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32))
    mask = jnp.asarray(rng.random(E) > 0.3)

    fast = segment_sum(vals, ids, N, mask=mask, blocks=blocks4,
                       fixed_dst=True)
    ref = segment_sum(vals, ids, N, mask=mask)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-6)

    fast = segment_mean(vals, ids, N, mask=mask, blocks=blocks4,
                        fixed_dst=True)
    ref = segment_mean(vals, ids, N, mask=mask)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-6)

    fast = segment_softmax(vals, ids, N, mask=mask, blocks=blocks4,
                           fixed_dst=True)
    ref = segment_softmax(vals, ids, N, mask=mask)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-6)

    # dst gather broadcast == generic gather, and grad-of-grad agrees
    x = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    g_fast = gather_nodes(x, ids, blocks=blocks4, canonical_dst=True)
    g_ref = gather_nodes(x, ids)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref))

    def loss_fast(x):
        y = gather_nodes(x, ids, blocks=blocks4, canonical_dst=True)
        return jnp.sum(jnp.sin(y) ** 2)

    def loss_ref(x):
        return jnp.sum(jnp.sin(gather_nodes(x, ids)) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_fast)(x)), np.asarray(jax.grad(loss_ref)(x)),
        atol=1e-6,
    )
    hvp_fast = jax.grad(lambda x: jnp.sum(jax.grad(loss_fast)(x) * x))(x)
    hvp_ref = jax.grad(lambda x: jnp.sum(jax.grad(loss_ref)(x) * x))(x)
    np.testing.assert_allclose(
        np.asarray(hvp_fast), np.asarray(hvp_ref), atol=1e-6
    )


def test_fixed_degree_model_matches_packed():
    """Same graphs + params: fixed-degree model == packed model (energy per
    graph + forces per real atom) — the fast smoke twin of
    test_uniform_model_matches_packed."""
    rng = np.random.default_rng(6)
    samples = crystals(rng, [4, 3])
    kw = dict(cutoff=5.0, max_neighbors=12)
    b_packed = {
        k: jnp.asarray(v)
        for k, v in collate(samples, **kw, n_pad=8, e_pad=480)
        .asdict().items()
    }
    b_fd = {
        k: jnp.asarray(v)
        for k, v in collate(samples, **kw, n_pad=10, e_pad=120,
                            fixed_degree=True)
        .asdict().items()
    }
    m_packed = EquiformerV2MatPES(**{**TINY, "num_layers": 1})
    m_fd = EquiformerV2MatPES(**{**TINY, "num_layers": 1}, fixed_degree=True)
    params = m_packed.init(jax.random.PRNGKey(0), b_packed)

    out_p = matpes_energy_forces_stress(m_packed, params, b_packed)
    out_f = matpes_energy_forces_stress(m_fd, params, b_fd)

    e_p = np.asarray(out_p["energy_total"])
    e_f = np.asarray(out_f["energy_total"])
    assert np.abs(e_p - e_f).max() < 1e-4, (e_p, e_f)

    mp = np.asarray(b_packed["node_mask"])
    mf = np.asarray(b_fd["node_mask"])
    f_p = np.asarray(out_p["forces"])[mp]
    f_f = np.asarray(out_f["forces"])[mf]
    assert f_p.shape == f_f.shape
    assert np.abs(f_p - f_f).max() < 1e-4
