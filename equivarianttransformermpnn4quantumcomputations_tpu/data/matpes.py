"""MatPES-PBE dataset: pymatgen parsing, official split, z-scored energies.

Re-design of reference models/data_loader_matpes.py:
* pymatgen ``Structure.from_dict`` -> (Z, cart pos, cell) (reference :51-59);
* stress kBar -> eV/A^3 Voigt-6, constant 1/1602.1766 (reference :44,:62-75);
* official split via ``MatPES-PBE-split.json.gz`` (reference :115-159);
* per-atom-energy z-score from *train* statistics (reference :364-390);
* pickle structure cache so 400k pymatgen parses happen once
  (reference :211-236, datasets/MatPES/preprocess_cache.py).

pymatgen / monty are optional; imports are gated.
"""

from __future__ import annotations

import gzip
import json
import os
import pickle
import warnings
from typing import Sequence

import numpy as np

from .graph import GraphSample

__all__ = ["KBAR_TO_EV_ANG3", "MatPESDataset", "load_matpes", "parse_stress"]

KBAR_TO_EV_ANG3 = 1.0 / 1602.1766


def parse_stress(stress_raw) -> np.ndarray:
    """Voigt-6 stress in eV/A^3 from kBar input (3x3 or Voigt list)."""
    if stress_raw is None:
        return np.zeros(6, np.float32)
    arr = np.asarray(stress_raw, np.float64)
    if arr.shape == (3, 3):
        voigt = np.array(
            [arr[0, 0], arr[1, 1], arr[2, 2], arr[1, 2], arr[0, 2], arr[0, 1]]
        )
    else:
        voigt = arr.flatten()[:6]
    return (voigt * KBAR_TO_EV_ANG3).astype(np.float32)


def _structure_from_dict(d: dict):
    """pymatgen-free parse of a ``Structure.as_dict()`` payload.

    The MatPES JSON stores pymatgen-serialized structures (reference
    models/data_loader_matpes.py:51-59); the dict schema is stable:
    ``lattice.matrix`` (3x3 rows) + ``sites`` with ``species`` (element,
    occupancy) and fractional ``abc`` (Cartesian ``xyz`` also present in
    full dumps).  MatPES entries are ordered crystals: one element per site.
    """
    from .periodic import ATOMIC_NUMBERS

    cell = np.asarray(d["lattice"]["matrix"], np.float64)
    z, pos = [], []
    for site in d["sites"]:
        z.append(ATOMIC_NUMBERS[site["species"][0]["element"]])
        if "xyz" in site:
            pos.append(np.asarray(site["xyz"], np.float64))
        else:
            pos.append(np.asarray(site["abc"], np.float64) @ cell)
    return (
        np.asarray(z, np.int32),
        np.asarray(pos, np.float64).reshape(len(z), 3),
        cell,
    )


def _parse_entry(entry: dict):
    try:
        from pymatgen.core import Structure  # gated; preferred

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            s = Structure.from_dict(entry["structure"])
        z = np.asarray([site.specie.Z for site in s.sites], np.int32)
        pos = np.asarray(s.cart_coords, np.float32)
        cell = np.asarray(s.lattice.matrix, np.float32)
    except ImportError:
        z, pos, cell = _structure_from_dict(entry["structure"])
        pos = pos.astype(np.float32)
        cell = cell.astype(np.float32)
    # genuine MatPES-2025.1 key variants (reference _normalise_entry,
    # models/data_loader_matpes.py:82-107): total 'energy' or
    # 'energy_per_atom' * nsites; 'forces' or 'force'
    energy = entry.get("energy")
    if energy is None:
        epa = entry.get("energy_per_atom")
        energy = float(epa) * len(z) if epa is not None else 0.0
    energy = float(energy)
    forces = entry.get("forces")
    if forces is None:
        forces = entry.get("force")
    forces = np.asarray(
        forces if forces is not None else np.zeros((len(z), 3)), np.float32
    )
    stress = parse_stress(entry.get("stress"))
    return z, pos, cell, energy, forces, stress


class MatPESDataset:
    """List-of-entries dataset with optional pickle cache and z-scored E."""

    def __init__(
        self,
        entries: Sequence[dict],
        normalize_energy: bool = True,
        energy_mean: float = 0.0,
        energy_std: float = 1.0,
        max_samples: int | None = None,
        cache_path: str | None = None,
    ):
        if max_samples is not None:
            entries = entries[:max_samples]
        if cache_path is not None and os.path.exists(cache_path):
            with open(cache_path, "rb") as f:
                self.parsed = pickle.load(f)
        else:
            self.parsed = [_parse_entry(e) for e in entries]
            if cache_path is not None:
                tmp = cache_path + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump(self.parsed, f)
                os.replace(tmp, cache_path)
        self.normalize_energy = normalize_energy
        self.energy_mean = energy_mean
        self.energy_std = energy_std

    def __len__(self):
        return len(self.parsed)

    def compute_energy_stats(self):
        """Per-atom energy mean/std over the (train) set (reference :364-390)."""
        e = np.asarray(
            [p[3] / max(len(p[0]), 1) for p in self.parsed], np.float64
        )
        return float(e.mean()), float(max(e.std(), 1e-8))

    def __getitem__(self, idx: int) -> GraphSample:
        z, pos, cell, energy, forces, stress = self.parsed[idx]
        e_per_atom = energy / max(len(z), 1)
        if self.normalize_energy:
            e_per_atom = (e_per_atom - self.energy_mean) / self.energy_std
            forces = forces / self.energy_std
        return GraphSample(
            atomic_numbers=z,
            pos=pos,
            cell=cell,
            pbc=True,
            energy=e_per_atom,
            forces=forces,
            stress=stress,
        )


def load_matpes(
    data_path: str,
    split_path: str | None = None,
    cache_dir: str | None = None,
    max_train: int | None = None,
    max_val: int | None = None,
    max_test: int | None = None,
    normalize_energy: bool = True,
):
    """Load the MatPES json(.gz) and return (train, val, test) datasets.

    Uses the official split file when given (reference :115-159), else a
    seeded 90/5/5 random split.
    """
    try:
        from monty.serialization import loadfn  # gated; preferred

        entries = loadfn(data_path)
    except ImportError:
        # the MatPES dumps are plain JSON — monty only adds @module/@class
        # object revival, which the pure-dict parse path does not need
        opener = gzip.open if data_path.endswith(".gz") else open
        with opener(data_path, "rt") as f:
            entries = json.load(f)
    if not isinstance(entries, list):
        entries = list(entries.values())
    by_id = {e.get("matpes_id", i): e for i, e in enumerate(entries)}

    if split_path is not None:
        opener = gzip.open if split_path.endswith(".gz") else open
        with opener(split_path, "rt") as f:
            split = json.load(f)
        tr = split["train"]
        va = split["valid" if "valid" in split else "val"]
        te = split.get("test")
        if all(isinstance(i, int) for i in list(tr)[:50]):
            # index-keyed official split (the reference enumerates the raw
            # entry list and tests membership by position,
            # data_loader_matpes.py:135-152; everything not in train/valid
            # falls to test)
            tr_s, va_s = set(tr), set(va)
            train_e = [e for i, e in enumerate(entries) if i in tr_s]
            val_e = [e for i, e in enumerate(entries) if i in va_s]
            if te is None:
                test_e = [
                    e for i, e in enumerate(entries)
                    if i not in tr_s and i not in va_s
                ]
            else:
                te_s = set(te)
                test_e = [e for i, e in enumerate(entries) if i in te_s]
        else:
            train_e = [by_id[i] for i in tr if i in by_id]
            val_e = [by_id[i] for i in va if i in by_id]
            test_e = [by_id[i] for i in (te or []) if i in by_id]
    else:
        rng = np.random.default_rng(42)
        perm = rng.permutation(len(entries))
        n_val = n_test = int(0.05 * len(entries))
        n_train = len(entries) - n_val - n_test
        train_e = [entries[i] for i in perm[:n_train]]
        val_e = [entries[i] for i in perm[n_train : n_train + n_val]]
        test_e = [entries[i] for i in perm[n_train + n_val :]]

    def cp(split_name):
        if cache_dir is None:
            return None
        os.makedirs(cache_dir, exist_ok=True)
        return os.path.join(cache_dir, f"{split_name}_cache.pkl")

    train = MatPESDataset(
        train_e, normalize_energy=False, max_samples=max_train, cache_path=cp("train")
    )
    mean, std = train.compute_energy_stats()
    train.normalize_energy = normalize_energy
    train.energy_mean, train.energy_std = mean, std
    val = MatPESDataset(
        val_e, normalize_energy, mean, std, max_val, cp("val")
    )
    test = MatPESDataset(
        test_e, normalize_energy, mean, std, max_test, cp("test")
    )
    return train, val, test, {"energy_mean": mean, "energy_std": std}
