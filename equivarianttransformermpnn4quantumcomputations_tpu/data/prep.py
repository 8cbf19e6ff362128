"""Dataset preparation utilities (the reference's datasets/* prep scripts).

Counterparts of:
* datasets/QM9/qm9_ASEconversion.py / qm9_downloadv2.py — PyG QM9 -> ASE db
  (atomref-corrected option);
* datasets/QM9/qm9_create_small_ASEconversionSet.py — small debug db;
* datasets/QM9/DatasetStastics/datasetstatistics.py — per-property stats JSON
  (mean/std/min/max/percentiles) consumed by the loader normalization;
* datasets/OC20/convert_to_lmdb.py — handled in data/oc20.py:convert_to_lmdb;
* datasets/MatPES/preprocess_cache.py — handled by MatPESDataset cache_path.

All heavy deps (torch_geometric, ase) are gated: these are offline, one-shot
host tools.
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = [
    "compute_qm9_stats",
    "compute_qm9_stats_arrays",
    "pyg_qm9_to_ase_db",
    "make_small_db",
    "save_qm9_npz",
]

_RAW_KEYS = [
    "mu", "alpha", "homo", "lumo", "gap", "r2", "zpve",
    "U0", "U", "H", "G", "Cv",
]


def pyg_qm9_to_ase_db(pyg_root: str, db_path: str, atomref_corrected: bool = True,
                      max_samples: int | None = None):
    """Convert the PyTorch-Geometric QM9 dataset into an ASE sqlite db with
    the 12 raw properties in row.data (reference qm9_ASEconversion.py:1-44,
    qm9_downloadv2.py:20-36)."""
    from ase import Atoms  # gated
    from ase.db import connect
    from torch_geometric.datasets import QM9  # gated

    ds = QM9(root=pyg_root)
    n = len(ds) if max_samples is None else min(len(ds), max_samples)
    with connect(db_path, append=False) as db:
        for i in range(n):
            d = ds[i]
            atoms = Atoms(
                numbers=d.z.numpy(), positions=d.pos.numpy()
            )
            y = d.y[0].numpy()
            # PyG target order: mu alpha homo lumo gap r2 zpve U0 U H G Cv ...
            data = {k: float(y[j]) for j, k in enumerate(_RAW_KEYS)}
            db.write(atoms, data=data)
    return db_path


def make_small_db(db_path: str, out_path: str, n: int = 1000):
    """Small debug db (reference qm9_create_small_ASEconversionSet.py)."""
    from ase.db import connect

    with connect(db_path) as src, connect(out_path, append=False) as dst:
        for i, row in enumerate(src.select()):
            if i >= n:
                break
            dst.write(row.toatoms(), data=dict(row.data))
    return out_path


def save_qm9_npz(molecules, out_path: str):
    """Dependency-free QM9 dump consumed by ``data/qm9.py:QM9NpzDataset``.

    ``molecules``: iterable of (numbers int[n], positions float[n,3],
    raw_targets float[12] in _RAW_KEYS order).  One npz holds the whole set
    (concatenated atoms + molecule offsets) — the ASE-db equivalent for
    environments without ase.
    """
    numbers, positions, targets, offsets = [], [], [], [0]
    for z, pos, y in molecules:
        numbers.append(np.asarray(z, np.int32))
        positions.append(np.asarray(pos, np.float32).reshape(len(z), 3))
        targets.append(np.asarray(y, np.float32).reshape(12))
        offsets.append(offsets[-1] + len(z))
    np.savez_compressed(
        out_path,
        numbers=np.concatenate(numbers),
        positions=np.concatenate(positions),
        offsets=np.asarray(offsets, np.int64),
        targets_raw=np.stack(targets),
    )
    return out_path


def compute_qm9_stats_arrays(targets_raw, out_json: str):
    """Stats JSON (paper order/units) straight from a raw-target array —
    the npz-path counterpart of ``compute_qm9_stats``."""
    from .qm9 import PROPERTY_ORDER, RAW_KEY_ORDER, paper_targets

    arr = np.stack(
        [
            paper_targets(dict(zip(RAW_KEY_ORDER, row)))
            for row in np.asarray(targets_raw, np.float64)
        ]
    )
    stats = {}
    for j, name in enumerate(PROPERTY_ORDER):
        col = arr[:, j]
        stats[name] = {
            "mean": float(col.mean()),
            "std": float(col.std()),
            "min": float(col.min()),
            "max": float(col.max()),
            "p1": float(np.percentile(col, 1)),
            "p99": float(np.percentile(col, 99)),
        }
    out = {"count": int(arr.shape[0]), "stats": stats}
    os.makedirs(os.path.dirname(os.path.abspath(out_json)), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(out, f, indent=2)
    return out


def compute_qm9_stats(db_path: str, out_json: str):
    """Per-property statistics JSON in paper order/units
    (reference DatasetStastics/datasetstatistics.py:12; consumed by
    data/qm9.py:load_qm9_stats)."""
    from .qm9 import EV_TO_MEV, PROPERTY_ORDER

    from ase.db import connect

    rows = []
    with connect(db_path) as db:
        for row in db.select():
            d = row.data
            rows.append([
                d["alpha"], d["gap"] * EV_TO_MEV, d["homo"] * EV_TO_MEV,
                d["lumo"] * EV_TO_MEV, d["mu"], d["Cv"], d["G"] * EV_TO_MEV,
                d["H"] * EV_TO_MEV, d["r2"], d["U"] * EV_TO_MEV,
                d["U0"] * EV_TO_MEV, d["zpve"] * EV_TO_MEV,
            ])
    arr = np.asarray(rows, np.float64)
    stats = {}
    for j, name in enumerate(PROPERTY_ORDER):
        col = arr[:, j]
        stats[name] = {
            "mean": float(col.mean()),
            "std": float(col.std()),
            "min": float(col.min()),
            "max": float(col.max()),
            "p1": float(np.percentile(col, 1)),
            "p99": float(np.percentile(col, 99)),
        }
    out = {"count": int(arr.shape[0]), "stats": stats}
    os.makedirs(os.path.dirname(os.path.abspath(out_json)), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(out, f, indent=2)
    return out
