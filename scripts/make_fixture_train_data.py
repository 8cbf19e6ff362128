"""Generate REAL-FORMAT training fixtures with LEARNABLE labels
(VERDICT r4 next-step #5: fixture-scale real-data convergence).

Unlike ``tests/fixtures/make_fixtures.py`` (3 entries, random labels — pure
parser fixtures), these are big enough to train on and their labels are
smooth functions of the geometry, so a model can actually reduce val MAE:

* ``tests/fixtures/train/qm9_train.db`` — ASE-sqlite QM9 database (same
  schema as the reference conversion, datasets/QM9/qm9_ASEconversion.py)
  with ``--n-qm9`` molecules; all 12 raw properties derived from geometry
  (LJ energy, dipole proxy, gyration radius, pair sums).
* ``tests/fixtures/train/qm9_train_stats.json`` — stats JSON computed from
  the db (data/prep.py:compute_qm9_stats), the file the loader normalizes
  with (reference models/data_loader_qm9_v4.py:47-98).
* ``tests/fixtures/train/matpes_train.json.gz`` + ``matpes_split_train.json.gz``
  — MatPES-PBE-2025.1-format entries (pymatgen Structure.as_dict sites,
  total energy, forces, kBar stress; reference
  models/data_loader_matpes.py:51-107) for LJ crystals whose
  energy/forces come from the same potential as data/synthetic.py.

Deterministic.  Run: ``python scripts/make_fixture_train_data.py``.
"""

import gzip
import json
import os
import sqlite3
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from equivarianttransformermpnn4quantumcomputations_tpu.data.periodic import (  # noqa: E402
    SYMBOLS,
)
from equivarianttransformermpnn4quantumcomputations_tpu.data.synthetic import (  # noqa: E402
    _lj_energy_forces,
)
from tests.fixtures.make_fixtures import ASE_INIT, RAW_KEYS  # noqa: E402

OUT = os.path.join(REPO, "tests", "fixtures", "train")


def _geometry_labels(z, pos):
    """12 smooth geometry functionals standing in for the QM9 properties
    (raw-key units; scales O(1))."""
    n = len(z)
    e, _ = _lj_energy_forces(pos)
    centroid = pos.mean(0)
    rel = pos - centroid
    r2 = float(np.sum(rel**2))
    q = z - z.mean()
    mu = float(np.linalg.norm((q[:, None] * rel).sum(0)))
    d = np.linalg.norm(pos[None] - pos[:, None], axis=-1)
    iu = np.triu_indices(n, 1)
    inv_r = float(np.sum(1.0 / np.maximum(d[iu], 0.5)))
    homo = -0.2 - 0.05 * abs(e) / n
    gap = 0.1 + 0.02 * inv_r / n
    return {
        "mu": mu,
        "alpha": inv_r,
        "homo": homo,
        "lumo": homo + gap,
        "gap": gap,
        "r2": r2,
        "zpve": 0.01 * n + 0.001 * inv_r,
        "U0": e / n,
        "U": e / n + 0.01,
        "H": e / n + 0.02,
        "G": e / n - 0.01,
        "Cv": 0.3 * n + 0.1 * r2 / n,
    }


def make_qm9_train_db(path, n_mol=96, seed=0):
    """Returns the raw-target array [n_mol, 12] (RAW_KEYS order) for
    stats computation (the pure-numpy path — no ase in this image)."""
    rng = np.random.default_rng(seed)
    raws = []
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    for stmt in ASE_INIT:
        con.execute(stmt)
    con.execute("INSERT INTO information VALUES ('version', '9')")
    for i in range(n_mol):
        n = int(rng.integers(4, 11))
        z = rng.choice([1, 1, 1, 6, 6, 7, 8, 9], size=n).astype(np.int32)
        # jittered lattice positions: no overlaps, bounded LJ
        frac = (
            rng.permutation(12)[:n][:, None]
            * np.array([[0.53, 0.31, 0.17]])
            % 1.0
        ) + rng.uniform(-0.03, 0.03, size=(n, 3))
        pos = (frac * 6.0 - 3.0).astype(np.float64)
        props = {
            k: round(float(v), 6)
            for k, v in _geometry_labels(z, pos).items()
        }
        assert set(props) == set(RAW_KEYS)
        raws.append([props[k] for k in RAW_KEYS])
        con.execute(
            "INSERT INTO systems (unique_id, ctime, mtime, username, numbers,"
            " positions, cell, pbc, key_value_pairs, data, natoms)"
            " VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (
                f"train-fixture-{i:05d}", 0.0, 0.0, "fixture",
                np.ascontiguousarray(z, np.int32).tobytes(),
                np.ascontiguousarray(pos, np.float64).tobytes(),
                np.zeros((3, 3), np.float64).tobytes(),
                0, "{}", json.dumps(props), n,
            ),
        )
        sid = con.execute("SELECT last_insert_rowid()").fetchone()[0]
        for zz in np.unique(z):
            con.execute(
                "INSERT INTO species VALUES (?, ?, ?)",
                (int(zz), int((z == zz).sum()), sid),
            )
    con.commit()
    con.close()
    return np.asarray(raws, np.float64)


def _structure_dict(z, frac, cell):
    cell = np.asarray(cell, float)
    sites = []
    for zi, f in zip(z, frac):
        xyz = np.asarray(f) @ cell
        sites.append({
            "species": [{"element": SYMBOLS[int(zi)], "occu": 1}],
            "abc": [round(float(v), 8) for v in f],
            "xyz": [round(float(v), 8) for v in xyz],
            "label": SYMBOLS[int(zi)],
            "properties": {"magmom": 0.0},
        })
    a, b, c = (np.linalg.norm(cell[i]) for i in range(3))
    return {
        "@module": "pymatgen.core.structure",
        "@class": "Structure",
        "charge": 0,
        "lattice": {
            "matrix": [[float(v) for v in row] for row in cell],
            "pbc": [True, True, True],
            "a": float(a), "b": float(b), "c": float(c),
            "alpha": 90.0, "beta": 90.0, "gamma": 90.0,
            "volume": float(abs(np.linalg.det(cell))),
        },
        "sites": sites,
    }


def make_matpes_train_json(path, split_path, n_entries=64, seed=1):
    rng = np.random.default_rng(seed)
    entries = []
    for i in range(n_entries):
        n = int(rng.integers(4, 9))
        cell = np.eye(3) * 6.0 + rng.normal(size=(3, 3)) * 0.2
        frac = (
            rng.permutation(8)[:n][:, None]
            * np.array([[0.53, 0.31, 0.17]])
            % 1.0
        ) + rng.uniform(-0.04, 0.04, size=(n, 3))
        pos = frac @ cell
        z = rng.integers(1, 30, size=n)
        e, f = _lj_energy_forces(pos)
        entries.append({
            "matpes_id": f"matpes-train-fixture-{i:05d}",
            "formation_energy_per_atom": round(e / n, 8),
            "energy": round(float(e), 6),
            "energy_per_atom": round(e / n, 8),
            "nsites": n,
            "structure": _structure_dict(z, frac, cell),
            "forces": np.asarray(f, float).round(6).tolist(),
            "stress": np.zeros((3, 3)).tolist(),
            "bandgap": 0.0,
            "functional": "PBE",
            "provenance": "train-fixture",
        })
    with gzip.open(path, "wt") as fh:
        json.dump(entries, fh)
    n_val = max(n_entries // 8, 2)
    n_test = max(n_entries // 8, 2)
    idx = list(range(n_entries))
    with gzip.open(split_path, "wt") as fh:
        json.dump(
            {"train": idx[: n_entries - n_val - n_test],
             "valid": idx[n_entries - n_val - n_test : n_entries - n_test]},
            fh,
        )


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    db = os.path.join(OUT, "qm9_train.db")
    raw_targets = make_qm9_train_db(db)
    from equivarianttransformermpnn4quantumcomputations_tpu.data.prep import (
        compute_qm9_stats_arrays,
    )

    # RAW_KEYS here is the dataset raw order; the stats fn expects that
    # order too (data/qm9.py:RAW_KEY_ORDER) — assert they agree
    from equivarianttransformermpnn4quantumcomputations_tpu.data.qm9 import (
        RAW_KEY_ORDER,
    )

    assert list(RAW_KEYS) == list(RAW_KEY_ORDER), (RAW_KEYS, RAW_KEY_ORDER)
    compute_qm9_stats_arrays(
        raw_targets, os.path.join(OUT, "qm9_train_stats.json")
    )
    make_matpes_train_json(
        os.path.join(OUT, "matpes_train.json.gz"),
        os.path.join(OUT, "matpes_split_train.json.gz"),
    )
    print("train fixtures written to", OUT)
