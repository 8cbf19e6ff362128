"""OC20 extxyz loader tests with a stubbed ase.io (ase absent in this env).

Covers the cumulative-index lazy access and the quick_init estimation mode
(reference models/data_loader_oc20v2.py:27-168, :57-83).
"""

import sys
import types

import numpy as np
import pytest


class FakeAtoms:
    def __init__(self, n, energy, seed):
        rng = np.random.default_rng(seed)
        self.numbers = rng.integers(1, 30, size=n)
        self.positions = rng.normal(size=(n, 3))
        self._cell = np.eye(3) * 10.0
        self.pbc = np.array([True, True, True])
        self._energy = energy
        self._forces = rng.normal(size=(n, 3))

    @property
    def cell(self):
        return self._cell

    def get_potential_energy(self):
        return self._energy

    def get_forces(self):
        return self._forces

    def get_tags(self):
        t = np.zeros(len(self.numbers), np.int64)
        t[0] = 1  # one fixed atom
        return t


# fake per-file frame lists: file index -> frames
_FILES = {
    "a.extxyz": [FakeAtoms(4, 10.0 + i, seed=i) for i in range(5)],
    "b.extxyz": [FakeAtoms(3, 20.0 + i, seed=10 + i) for i in range(3)],
    "c.extxyz": [FakeAtoms(5, 30.0 + i, seed=20 + i) for i in range(4)],
}


def _fake_read(path, index=":"):
    import os

    frames = _FILES[os.path.basename(path)]
    if index == ":":
        return list(frames)
    return frames[index]


@pytest.fixture()
def stub_ase(monkeypatch):
    ase = types.ModuleType("ase")
    ase_io = types.ModuleType("ase.io")
    ase_io.read = _fake_read
    ase.io = ase_io
    monkeypatch.setitem(sys.modules, "ase", ase)
    monkeypatch.setitem(sys.modules, "ase.io", ase_io)


def test_oc20_exact_index(stub_ase):
    from equivarianttransformermpnn4quantumcomputations_tpu.data.oc20 import (
        OC20_ENERGY_MEAN,
        OC20_ENERGY_STD,
        OC20Dataset,
    )

    ds = OC20Dataset(["a.extxyz", "b.extxyz", "c.extxyz"], normalize=False)
    assert len(ds) == 12
    # frame identity through the cumulative index
    assert ds[0].energy == 10.0
    assert ds[4].energy == 14.0
    assert ds[5].energy == 20.0      # first frame of b
    assert ds[8].energy == 30.0      # first frame of c
    assert ds[11].energy == 33.0
    s = ds[5]
    assert s.atomic_numbers.shape == (3,)
    assert s.fixed is not None and bool(s.fixed[0]) and not s.fixed[1:].any()
    # OCP normalization applied when requested
    dsn = OC20Dataset(["a.extxyz"], normalize=True)
    assert np.isclose(
        dsn[0].energy, (10.0 - OC20_ENERGY_MEAN) / OC20_ENERGY_STD
    )


def test_oc20_quick_init_estimates(stub_ase):
    from equivarianttransformermpnn4quantumcomputations_tpu.data.oc20 import (
        OC20Dataset,
    )

    # sample only the first file (5 frames) -> estimate 5 per file -> 15
    ds = OC20Dataset(
        ["a.extxyz", "b.extxyz", "c.extxyz"],
        normalize=False,
        quick_init=True,
        quick_init_sample=1,
    )
    assert len(ds) == 15
    # valid indices resolve exactly
    assert ds[0].energy == 10.0
    assert ds[4].energy == 14.0
    # overshoot into b (true length 3, estimated 5): clamps to last frame
    assert ds[5].energy == 20.0
    assert ds[8].energy == 22.0      # b[3] doesn't exist -> b[-1]
    assert ds[9].energy == 22.0
