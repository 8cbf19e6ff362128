"""Synthetic datasets for integration tests and benchmarks (no ase/pymatgen).

Generates random molecules/crystals with a Lennard-Jones-like energy surface
so that training has real signal — the framework-level analog of the
reference's debug configs (configs/QM9/config_equiformerV2.py:227-234) that
stand in for fast integration tests.
"""

from __future__ import annotations

import numpy as np

from .graph import GraphSample

__all__ = ["SyntheticMolecules", "SyntheticCrystals"]


def _lj_energy_forces(pos, eps=0.1, sigma=1.8):
    n = pos.shape[0]
    diff = pos[None, :, :] - pos[:, None, :]
    d = np.linalg.norm(diff, axis=-1)
    np.fill_diagonal(d, np.inf)
    sr6 = (sigma / d) ** 6
    e = 2.0 * eps * np.sum(sr6 * sr6 - sr6)
    # dE/dr_i
    dv = 4.0 * eps * (-12 * sr6 * sr6 + 6 * sr6) / (d * d)
    f = np.zeros_like(pos)
    for i in range(n):
        f[i] = -np.sum(dv[i][:, None] * (pos[i] - pos), axis=0)
    return float(e), f.astype(np.float32)


class SyntheticMolecules:
    """Random molecules with LJ energies, per-atom-normalized, QM9-style y."""

    def __init__(self, n_samples=64, n_atoms=8, seed=0, targets=1):
        rng = np.random.default_rng(seed)
        raw = []
        for _ in range(n_samples):
            # jittered lattice positions: no overlapping atoms, bounded LJ
            base = rng.permutation(n_atoms * 2)[:n_atoms]
            grid = np.stack(
                [(base // 4) % 4, (base // 2) % 2, base % 2], axis=1
            ).astype(np.float32)
            pos = grid * 2.0 + rng.normal(size=(n_atoms, 3)).astype(
                np.float32
            ) * 0.25
            z = rng.integers(1, 9, size=n_atoms).astype(np.int32)
            e, f = _lj_energy_forces(pos)
            raw.append((z, pos, e, f))
        es = np.asarray([r[2] / n_atoms for r in raw])
        mu, sd = es.mean(), max(es.std(), 1e-6)
        self.samples = [
            GraphSample(
                atomic_numbers=z,
                pos=pos,
                y=np.full(targets, (e / n_atoms - mu) / sd, np.float32),
                energy=(e / n_atoms - mu) / sd,
                forces=(f / sd).astype(np.float32),
            )
            for z, pos, e, f in raw
        ]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


class SyntheticCrystals:
    """Random periodic cells with LJ energies (central image only).

    ``stats=(mu, sd)``: normalize with EXTERNAL per-atom-energy stats (pass
    the train set's ``.stats`` to val/test so train and val targets share
    one scale — per-seed self-normalization made val MAEs incomparable).
    """

    def __init__(self, n_samples=32, n_atoms=6, seed=0, stats=None):
        rng = np.random.default_rng(seed)
        raw = []
        for _ in range(n_samples):
            cell = (np.eye(3) * 6.0 + rng.normal(size=(3, 3)) * 0.2).astype(
                np.float32
            )
            # jittered sub-lattice: atoms can't overlap -> bounded LJ
            frac = (
                rng.permutation(8)[:n_atoms][:, None]
                * np.array([[0.53, 0.31, 0.17]])
                % 1.0
            ) + rng.uniform(-0.04, 0.04, size=(n_atoms, 3))
            pos = (frac @ cell).astype(np.float32)
            z = rng.integers(1, 30, size=n_atoms).astype(np.int32)
            e, f = _lj_energy_forces(pos)
            raw.append((z, pos, cell, e, f))
        es = np.asarray([r[3] / n_atoms for r in raw])
        if stats is None:
            mu, sd = es.mean(), max(es.std(), 1e-6)
        else:
            mu, sd = stats
        self.stats = (float(mu), float(sd))
        self.samples = [
            GraphSample(
                atomic_numbers=z,
                pos=pos,
                cell=cell,
                pbc=True,
                energy=(e / n_atoms - mu) / sd,
                forces=(f / sd).astype(np.float32),
                stress=np.zeros(6, np.float32),
            )
            for z, pos, cell, e, f in raw
        ]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]
