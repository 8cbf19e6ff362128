"""QM9 dataset: ASE-db reader, paper-order targets, z-score normalization.

Re-design of reference models/data_loader_qm9_v4.py:
* 12 targets reordered to PAPER ORDER with eV->meV conversion on the energy
  targets (reference :196-211);
* z-score normalization from the stats JSON
  (datasets/QM9/DatasetStastics/run_stats_corrected/qm9_full_stats.json,
  reference :47-98), std==0 guarded to 1;
* target-subset selection (reference :216-222);
* 80/10/10 random split with seed 42 (reference :283-287; bitwise
  torch-identical via ``torch.randperm`` when torch is importable, see
  ``qm9_random_split``);
* ``denormalize_targets`` (reference :323-340).

ASE is an optional dependency: import is gated so the rest of the framework
works without it (tests use synthetic molecules).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

from .graph import GraphSample

__all__ = [
    "PROPERTY_ORDER",
    "RAW_KEY_ORDER",
    "load_qm9_stats",
    "QM9Dataset",
    "QM9NpzDataset",
    "qm9_random_split",
    "denormalize_targets",
]

# raw (PyG download) column order, as stored by data/prep.py and the npz dump
RAW_KEY_ORDER = [
    "mu", "alpha", "homo", "lumo", "gap", "r2", "zpve",
    "U0", "U", "H", "G", "Cv",
]

# paper order (reference data_loader_qm9_v4.py:44-45)
PROPERTY_ORDER = [
    "α", "Δε", "ε_HOMO", "ε_LUMO", "μ", "C_v",
    "G", "H", "R²", "U", "U₀", "ZPVE",
]

EV_TO_MEV = 1000.0

# paper order expressed as (raw column index, unit scale) — the vectorized
# twin of ``paper_targets`` (reference models/data_loader_qm9_v4.py:196-211)
_PAPER_FROM_RAW_IDX = np.asarray(
    [RAW_KEY_ORDER.index(k)
     for k in ["alpha", "gap", "homo", "lumo", "mu", "Cv",
               "G", "H", "r2", "U", "U0", "zpve"]],
    np.int64,
)
_PAPER_SCALE = np.asarray(
    [1.0, EV_TO_MEV, EV_TO_MEV, EV_TO_MEV, 1.0, 1.0,
     EV_TO_MEV, EV_TO_MEV, 1.0, EV_TO_MEV, EV_TO_MEV, EV_TO_MEV],
    np.float32,
)


def load_qm9_stats(json_path: str):
    """Return (mean [12], std [12]) float32 in paper order from the stats JSON."""
    with open(json_path) as f:
        j = json.load(f)
    stats = j.get("stats", j)
    means, stds = [], []
    for name in PROPERTY_ORDER:
        entry = stats.get(name)
        if entry is None:
            for k in stats:
                if str(k).replace(" ", "") == name.replace(" ", ""):
                    entry = stats[k]
                    break
        if entry is None:
            raise KeyError(f"property {name} missing from {json_path}")
        means.append(float(entry["mean"]))
        stds.append(float(entry["std"]))
    mean = np.asarray(means, np.float32)
    std = np.asarray(stds, np.float32)
    std[std == 0.0] = 1.0
    return mean, std


def paper_targets(d) -> np.ndarray:
    """Raw PyG units -> paper units, paper order (reference
    models/data_loader_qm9_v4.py:196-211).  ``d`` maps raw keys to scalars."""
    return np.asarray(
        [
            d["alpha"],
            d["gap"] * EV_TO_MEV,
            d["homo"] * EV_TO_MEV,
            d["lumo"] * EV_TO_MEV,
            d["mu"],
            d["Cv"],
            d["G"] * EV_TO_MEV,
            d["H"] * EV_TO_MEV,
            d["r2"],
            d["U"] * EV_TO_MEV,
            d["U0"] * EV_TO_MEV,
            d["zpve"] * EV_TO_MEV,
        ],
        dtype=np.float32,
    )


class _AseDbLite:
    """Pure-python reader for ASE's sqlite3 database format.

    Schema from ase/db/sqlite.py (format version >= 5): one row per system
    in the ``systems`` table; ``numbers`` is an int32 blob, ``positions`` a
    float64 blob (C order, little-endian), ``data`` a JSON text column.
    The reference writes QM9 this way (datasets/QM9/qm9_ASEconversion.py:
    ``db.write(atoms, data=properties)``), so this reads genuine ASE dbs
    without the ase dependency.
    """

    def __init__(self, path: str):
        import sqlite3

        if not os.path.exists(path):
            raise FileNotFoundError(path)
        # read-only access from the PaddedLoader's prefetch thread is safe
        # (no writes ever happen through this handle); sqlite's same-thread
        # guard would otherwise reject the background batch builder
        self.con = sqlite3.connect(path, check_same_thread=False)

    def count(self) -> int:
        return self.con.execute("SELECT COUNT(*) FROM systems").fetchone()[0]

    def get(self, row_id: int):
        row = self.con.execute(
            "SELECT numbers, positions, data FROM systems WHERE id=?",
            (row_id,),
        ).fetchone()
        if row is None:
            raise KeyError(f"no systems row with id={row_id}")
        num_blob, pos_blob, data_txt = row
        numbers = np.frombuffer(num_blob, dtype=np.int32)
        positions = np.frombuffer(pos_blob, dtype=np.float64).reshape(-1, 3)
        data = json.loads(data_txt) if data_txt else {}
        return numbers, positions, data


class QM9Dataset:
    """ASE-db backed QM9 dataset yielding GraphSamples (paper units/order).

    Uses ase when importable; otherwise reads the sqlite file directly
    (``_AseDbLite``) — same genuine on-disk format either way.
    """

    def __init__(
        self,
        db_path: str,
        stats_json: str | None = None,
        max_samples: int | None = None,
        normalize: bool = True,
        target_indices: Sequence[int] | None = None,
    ):
        try:
            from ase.db import connect  # gated import

            self.db = connect(db_path)
            self._lite = None
            n = self.db.count()
        except ImportError:
            self.db = None
            self._lite = _AseDbLite(db_path)
            n = self._lite.count()
        self.keys = list(range(1, n + 1))
        if max_samples is not None:
            self.keys = self.keys[:max_samples]
        self.normalize = normalize
        self.target_indices = (
            np.asarray(target_indices) if target_indices is not None else None
        )
        if stats_json is None:
            stats_json = os.path.join(
                os.path.dirname(db_path), "qm9_full_stats.json"
            )
        if normalize:
            self.mean, self.std = load_qm9_stats(stats_json)
        else:
            self.mean = np.zeros(12, np.float32)
            self.std = np.ones(12, np.float32)

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, idx: int) -> GraphSample:
        if self.db is not None:
            row = self.db.get(id=self.keys[idx])
            atoms = row.toatoms()
            numbers, positions = atoms.numbers, atoms.positions
            data = row.data
        else:
            numbers, positions, data = self._lite.get(self.keys[idx])
        targets = paper_targets(data)
        if self.target_indices is not None:
            targets = targets[self.target_indices]
            mean = self.mean[self.target_indices]
            std = self.std[self.target_indices]
        else:
            mean, std = self.mean, self.std
        if self.normalize:
            targets = (targets - mean) / std
        return GraphSample(
            atomic_numbers=np.asarray(numbers, np.int32),
            pos=np.asarray(positions, np.float32),
            y=targets,
        )


class QM9NpzDataset:
    """npz-backed QM9 dataset — same target pipeline, no ASE dependency.

    Layout (written by ``data/prep.py:save_qm9_npz``): ``numbers`` int32
    concatenated over molecules, ``positions`` float32 [A, 3] likewise,
    ``offsets`` int64 [N+1] molecule boundaries, ``targets_raw`` float32
    [N, 12] in ``RAW_KEY_ORDER`` (raw PyG units).  Conversion to paper
    units/order, z-score normalization and target subsets are identical to
    ``QM9Dataset`` (reference models/data_loader_qm9_v4.py:196-222).
    """

    def __init__(
        self,
        npz_path: str,
        stats_json: str | None = None,
        max_samples: int | None = None,
        normalize: bool = True,
        target_indices: Sequence[int] | None = None,
    ):
        with np.load(npz_path) as f:
            self.numbers = np.asarray(f["numbers"], np.int32)
            self.positions = np.asarray(f["positions"], np.float32)
            self.offsets = np.asarray(f["offsets"], np.int64)
            raw = np.asarray(f["targets_raw"], np.float32)
        # vectorized paper_targets: column permutation + unit-scale vector
        # (a per-row python loop here costs ~134k iterations on full QM9)
        self.targets = (raw[:, _PAPER_FROM_RAW_IDX] * _PAPER_SCALE).astype(
            np.float32
        )
        self.n = len(self.targets)
        if max_samples is not None:
            self.n = min(self.n, max_samples)
        self.normalize = normalize
        self.target_indices = (
            np.asarray(target_indices) if target_indices is not None else None
        )
        if normalize:
            if stats_json is None:
                stats_json = os.path.join(
                    os.path.dirname(npz_path), "qm9_full_stats.json"
                )
            self.mean, self.std = load_qm9_stats(stats_json)
        else:
            self.mean = np.zeros(12, np.float32)
            self.std = np.ones(12, np.float32)

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int) -> GraphSample:
        a, b = int(self.offsets[idx]), int(self.offsets[idx + 1])
        targets = self.targets[idx]
        mean, std = self.mean, self.std
        if self.target_indices is not None:
            targets = targets[self.target_indices]
            mean = mean[self.target_indices]
            std = std[self.target_indices]
        if self.normalize:
            targets = (targets - mean) / std
        return GraphSample(
            atomic_numbers=self.numbers[a:b],
            pos=self.positions[a:b],
            y=targets,
        )


def qm9_random_split(
    n: int, val_split: float = 0.1, test_split: float = 0.1, seed: int = 42
):
    """Index split BITWISE-matching the reference protocol (reference
    :278-287): ``torch.utils.data.random_split`` with
    ``torch.Generator().manual_seed(42)`` is internally
    ``torch.randperm(n, generator=g)`` sliced sequentially into
    [train, val, test].  Uses torch's randperm when torch is importable so
    MAE comparisons share the exact test molecules; falls back to a numpy
    permutation (same protocol, different RNG stream) otherwise."""
    n_val = int(val_split * n)
    n_test = int(test_split * n)
    n_train = n - n_val - n_test
    try:
        import torch

        g = torch.Generator().manual_seed(seed)
        perm = torch.randperm(n, generator=g).numpy()
    except ImportError:  # torch-free environment
        perm = np.random.default_rng(seed).permutation(n)
    return (
        perm[:n_train],
        perm[n_train : n_train + n_val],
        perm[n_train + n_val :],
    )


def denormalize_targets(y_norm, mean, std, target_indices=None):
    if target_indices is not None:
        mean = mean[np.asarray(target_indices)]
        std = std[np.asarray(target_indices)]
    return y_norm * std + mean
