"""OC20 S2EF dataset: lazy extxyz reader, OCP normalization, LMDB cache.

Re-design of reference models/data_loader_oc20v2.py and
datasets/OC20/convert_to_lmdb.py:
* lazy extxyz access through a cumulative frame-count index over the
  compressed trajectory files (reference :27-168);
* hardcoded OCP energy normalization mean/std (reference :21-24,
  configs/OC20/oc20_config_corrected.py:15-18);
* fixed-atom tags from the constraint (reference :151-153);
* optional LMDB conversion for O(1) random access at 2M-frame scale
  (reference datasets/OC20/convert_to_lmdb.py:18-50).

ase / lmdb are optional; imports gated.
"""

from __future__ import annotations

import os
import pickle
from typing import Sequence

import numpy as np

from .graph import GraphSample

__all__ = [
    "OC20_ENERGY_MEAN",
    "OC20_ENERGY_STD",
    "OC20Dataset",
    "OC20LmdbDataset",
    "convert_to_lmdb",
]

# OCP normalization (reference data_loader_oc20v2.py:21-24)
OC20_ENERGY_MEAN = -0.7554450631141663
OC20_ENERGY_STD = 2.887317180633545


def _atoms_to_sample(atoms, normalize: bool) -> GraphSample:
    energy = float(atoms.get_potential_energy())
    forces = np.asarray(atoms.get_forces(), np.float32)
    if normalize:
        energy = (energy - OC20_ENERGY_MEAN) / OC20_ENERGY_STD
        forces = forces / OC20_ENERGY_STD
    # fixed-atom mask from tags (reference data_loader_oc20v2.py:151-153)
    fixed = np.asarray(atoms.get_tags(), np.int64) > 0
    return GraphSample(
        atomic_numbers=np.asarray(atoms.numbers, np.int32),
        pos=np.asarray(atoms.positions, np.float32),
        cell=np.asarray(atoms.cell[:], np.float32),
        pbc=bool(atoms.pbc.any()),
        energy=energy,
        forces=forces,
        fixed=fixed,
    )


class OC20Dataset:
    """Lazy extxyz-backed dataset over a directory of trajectory files."""

    def __init__(
        self,
        paths: Sequence[str] | str,
        normalize: bool = True,
        max_samples: int | None = None,
        quick_init: bool = False,
        quick_init_sample: int = 10,
    ):
        """``quick_init=True`` estimates frame counts from a small sample of
        files instead of parsing every file up front (reference
        data_loader_oc20v2.py:57-83) — at 2M-frame scale the exact count
        costs hours before step 1.  Like the reference, estimated counts mean
        a few indices at the end of each file may be inaccessible (wrapped to
        the last frame here rather than raising)."""
        try:
            from ase.io import read  # gated; preferred when available
        except ImportError:
            from .extxyz import read_extxyz as read  # pure-python fallback

        self._read = read
        if isinstance(paths, str):
            if os.path.isdir(paths):
                paths = sorted(
                    os.path.join(paths, f)
                    for f in os.listdir(paths)
                    if "xyz" in f
                )
            else:
                paths = [paths]
        self.paths = list(paths)
        self.normalize = normalize
        self.quick_init = quick_init
        # cumulative frame counts per file (reference :27-83)
        if quick_init:
            sample = self.paths[: max(1, min(quick_init_sample, len(self.paths)))]
            per_file = [len(read(p, index=":")) for p in sample]
            avg = max(1, int(sum(per_file) / len(per_file)))
            counts = [avg] * len(self.paths)
        else:
            counts = [len(read(p, index=":")) for p in self.paths]
        self.cumsum = np.concatenate([[0], np.cumsum(counts)])
        self.n = int(self.cumsum[-1])
        if max_samples is not None:
            self.n = min(self.n, max_samples)

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int) -> GraphSample:
        f = int(np.searchsorted(self.cumsum, idx, side="right")) - 1
        local = idx - int(self.cumsum[f])
        try:
            atoms = self._read(self.paths[f], index=local)
        except (IndexError, StopIteration):
            if not self.quick_init:
                raise
            # estimated counts can overshoot a file's true length
            # (reference quick_init caveat) — clamp to its last frame
            atoms = self._read(self.paths[f], index=-1)
        return _atoms_to_sample(atoms, self.normalize)


class OC20LmdbDataset:
    """LMDB-backed dataset (pickle values) for 2M-frame random access."""

    def __init__(self, lmdb_path: str, normalize: bool = True):
        import lmdb  # gated

        self.env = lmdb.open(
            lmdb_path, readonly=True, lock=False, readahead=False,
            subdir=os.path.isdir(lmdb_path),
        )
        with self.env.begin() as txn:
            self.n = pickle.loads(txn.get(b"__len__"))
        self.normalize = normalize

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int) -> GraphSample:
        with self.env.begin() as txn:
            rec = pickle.loads(txn.get(f"{idx}".encode()))
        s = GraphSample(**rec)
        if self.normalize:
            s.energy = (s.energy - OC20_ENERGY_MEAN) / OC20_ENERGY_STD
            s.forces = s.forces / OC20_ENERGY_STD
        return s


def convert_to_lmdb(dataset, lmdb_path: str, map_size: int = 150 * 2**30):
    """Write any GraphSample dataset to LMDB (reference convert_to_lmdb.py)."""
    import lmdb  # gated

    env = lmdb.open(lmdb_path, map_size=map_size)
    with env.begin(write=True) as txn:
        for i in range(len(dataset)):
            s = dataset[i]
            rec = dict(
                atomic_numbers=s.atomic_numbers,
                pos=s.pos,
                cell=s.cell,
                pbc=s.pbc,
                energy=s.energy,
                forces=s.forces,
                fixed=s.fixed,
            )
            txn.put(f"{i}".encode(), pickle.dumps(rec))
        txn.put(b"__len__", pickle.dumps(len(dataset)))
    env.sync()
    env.close()
