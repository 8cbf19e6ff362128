"""Force / stress tests: autograd vs finite differences, equivariance, PBC."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from equivarianttransformermpnn4quantumcomputations_tpu.data.graph import (
    GraphSample,
    collate,
    radius_graph_pbc,
)
from equivarianttransformermpnn4quantumcomputations_tpu.models.matpes import (
    EquiformerV2MatPES,
    matpes_energy_forces_stress,
    matpes_energy_forces_stress_pergraph,
)
from equivarianttransformermpnn4quantumcomputations_tpu.models.oc20 import (
    EquiformerV2OC20,
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
)


def crystal_sample(rng, n=4):
    cell = (np.eye(3) * 4.0 + rng.normal(size=(3, 3)) * 0.1).astype(np.float32)
    frac = rng.uniform(0, 1, size=(n, 3))
    pos = (frac @ cell).astype(np.float32)
    z = rng.integers(1, 15, size=n).astype(np.int32)
    return GraphSample(
        atomic_numbers=z, pos=pos, cell=cell, pbc=True,
        energy=0.0, forces=np.zeros((n, 3), np.float32),
        stress=np.zeros(6, np.float32),
    )


def to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.asdict().items()}


def test_matpes_forces_match_finite_difference():
    rng = np.random.default_rng(0)
    s = crystal_sample(rng)
    b = to_jnp(collate([s], cutoff=5.0, max_neighbors=12, n_pad=6, e_pad=220))
    model = EquiformerV2MatPES(**TINY, gata=True)
    params = model.init(jax.random.PRNGKey(0), b)

    out = matpes_energy_forces_stress(model, params, b)
    forces = np.asarray(out["forces"])

    def energy_at(pos):
        bb = dict(b)
        outs = model.apply(params, bb, pos=jnp.asarray(pos))
        return float(jnp.sum(outs["energy_total"]))

    eps = 3e-3
    pos0 = np.asarray(b["pos"])
    for (i, k) in [(0, 0), (1, 2), (2, 1), (3, 0)]:
        dp = pos0.copy()
        dp[i, k] += eps
        ep = energy_at(dp)
        dm = pos0.copy()
        dm[i, k] -= eps
        em = energy_at(dm)
        fd = -(ep - em) / (2 * eps)
        assert abs(fd - forces[i, k]) < 5e-3 + 0.05 * abs(fd), (
            i, k, fd, forces[i, k]
        )


def test_matpes_stress_matches_finite_difference():
    rng = np.random.default_rng(1)
    s = crystal_sample(rng)
    b = to_jnp(collate([s], cutoff=5.0, max_neighbors=12, n_pad=6, e_pad=220))
    model = EquiformerV2MatPES(**TINY, gata=False)
    params = model.init(jax.random.PRNGKey(0), b)
    out = matpes_energy_forces_stress_pergraph(model, params, b)
    stress = np.asarray(out["stress"])[0]
    vol = abs(np.linalg.det(np.asarray(b["cell"][0])))

    def energy_strained(strain):
        defo = np.eye(3, dtype=np.float32) + strain
        bb = dict(b)
        bb["strained_cell"] = jnp.asarray(
            np.asarray(b["cell"]) @ defo[None]
        )
        pos_s = jnp.asarray(np.asarray(b["pos"]) @ defo)
        outs = model.apply(params, bb, pos=pos_s)
        return float(jnp.sum(outs["energy_total"]))

    eps = 2e-3
    voigt = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]
    for vi, (a, c) in enumerate(voigt):
        st = np.zeros((3, 3), np.float32)
        st[a, c] += eps / 2
        st[c, a] += eps / 2
        ep = energy_strained(st)
        em = energy_strained(-st)
        fd = (ep - em) / (2 * eps) / vol
        got = stress[vi]
        assert abs(fd - got) < 5e-3 + 0.05 * abs(fd), (vi, fd, got)


@pytest.mark.slow
def test_pergraph_stress_batch_independence():
    """B=4 per-graph stress == each graph's stress computed alone (B=1).

    Guards the per-graph [B,3,3]-strain path: a single batch-shared strain
    would couple dE/d eps across graphs (wrong for B>1), so
    ``matpes_energy_forces_stress(regress_stress=True)`` must route to the
    per-graph variant and match B=1 results exactly."""
    rng = np.random.default_rng(7)
    samples = [crystal_sample(rng, n=3 + i % 2) for i in range(4)]
    model = EquiformerV2MatPES(**TINY, gata=False)
    kw = dict(cutoff=5.0, max_neighbors=12)
    b4 = to_jnp(collate(samples, **kw, n_pad=20, e_pad=900))
    params = model.init(jax.random.PRNGKey(0), b4)
    out4 = matpes_energy_forces_stress(model, params, b4, regress_stress=True)
    stress4 = np.asarray(out4["stress"])
    assert stress4.shape == (4, 6)
    for i, s in enumerate(samples):
        b1 = to_jnp(collate([s], **kw, n_pad=6, e_pad=240))
        out1 = matpes_energy_forces_stress_pergraph(model, params, b1)
        s1 = np.asarray(out1["stress"])[0]
        assert np.abs(stress4[i] - s1).max() < 1e-5, (i, stress4[i], s1)


def test_oc20_force_head_equivariance():
    """Explicit force head: rotating the structure rotates the forces."""
    rng = np.random.default_rng(2)
    n = 6
    pos = (rng.normal(size=(n, 3)) * 1.5).astype(np.float32)
    z = rng.integers(1, 15, size=n).astype(np.int32)
    s1 = GraphSample(atomic_numbers=z, pos=pos)
    model = EquiformerV2OC20(
        **{**TINY, "use_gate_act": True, "use_sep_s2_act": False},
        regress_forces=True,
    )
    b1 = to_jnp(collate([s1], 5.0, 20, n_pad=8, e_pad=64))
    params = model.init(jax.random.PRNGKey(0), b1)
    f1 = np.asarray(model.apply(params, b1)["forces"])[:n]

    from test_ops import rotmat_zyz

    Rm = rotmat_zyz(0.9, -0.5, 1.7).astype(np.float32)
    s2 = GraphSample(atomic_numbers=z, pos=pos @ Rm.T)
    b2 = to_jnp(collate([s2], 5.0, 20, n_pad=8, e_pad=64))
    f2 = np.asarray(model.apply(params, b2)["forces"])[:n]
    assert np.abs(f2 - f1 @ Rm.T).max() < 5e-4, np.abs(f2 - f1 @ Rm.T).max()


def test_pbc_minimum_image_distances():
    """Graph builder PBC distances match brute force over periodic images."""
    rng = np.random.default_rng(3)
    cell = np.array([[3.0, 0, 0], [0.4, 2.8, 0], [0, 0.3, 3.2]])
    pos = rng.uniform(0, 1, size=(5, 3)) @ cell
    src, dst, shift = radius_graph_pbc(pos, cell, cutoff=2.5, max_neighbors=None)
    # recompute and verify each edge distance < cutoff and correct
    for s, d, sh in zip(src, dst, shift):
        dvec = pos[d] + sh @ cell - pos[s]
        assert np.linalg.norm(dvec) < 2.5
    # brute force count of all (i, j, image) pairs within cutoff
    cnt = 0
    for i in range(5):
        for j in range(5):
            for a in (-1, 0, 1):
                for bb in (-1, 0, 1):
                    for c in (-1, 0, 1):
                        off = np.array([a, bb, c]) @ cell
                        d = np.linalg.norm(pos[j] + off - pos[i])
                        if 1e-6 < d < 2.5 and not (
                            i == j and a == bb == c == 0
                        ):
                            cnt += 1
    assert cnt == src.size


def test_matpes_autograd_forces_equivariance():
    rng = np.random.default_rng(4)
    s = crystal_sample(rng)
    model = EquiformerV2MatPES(
        **{**TINY, "use_gate_act": True, "use_sep_s2_act": False}, gata=False
    )
    b1 = to_jnp(collate([s], 5.0, 12, n_pad=6, e_pad=220))
    params = model.init(jax.random.PRNGKey(0), b1)
    f1 = np.asarray(matpes_energy_forces_stress(model, params, b1)["forces"])[:4]

    from test_ops import rotmat_zyz

    Rm = rotmat_zyz(-0.3, 0.8, 0.2).astype(np.float32)
    s2 = GraphSample(
        atomic_numbers=s.atomic_numbers,
        pos=(s.pos @ Rm.T).astype(np.float32),
        cell=(s.cell @ Rm.T).astype(np.float32),
        pbc=True,
        energy=0.0,
        forces=np.zeros((4, 3), np.float32),
        stress=np.zeros(6, np.float32),
    )
    b2 = to_jnp(collate([s2], 5.0, 12, n_pad=6, e_pad=220))
    f2 = np.asarray(matpes_energy_forces_stress(model, params, b2)["forces"])[:4]
    assert np.abs(f2 - f1 @ Rm.T).max() < 2e-3, np.abs(f2 - f1 @ Rm.T).max()
