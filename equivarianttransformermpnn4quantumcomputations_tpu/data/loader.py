"""Padded batch loader with background prefetch.

Replaces the reference's torch DataLoader + collate_* functions
(reference models/data_loader_qm9_v4.py:242-256 etc.) with a TPU-friendly
pipeline: every batch has identical static shapes (n_pad, e_pad) so a single
jitted step is compiled once; a daemon thread overlaps host-side graph
building (the expensive neighbor search) with device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import numpy as np

from .graph import PaddedBatch, collate

__all__ = ["PaddedLoader", "infer_pad_sizes"]


def infer_pad_sizes(
    dataset, cutoff: float, max_neighbors: int | None,
    batch_size: int, sample: int = 512, safety: float = 1.25,
    uniform: bool = False, fixed_degree: bool = False,
):
    """Estimate (n_pad, e_pad) from a sample of the dataset.

    ``sample``: how many graphs to measure (default 512; raised from 64 in
    round 5 — a tail-heavy dataset can hide its largest graphs from a small
    sample and overflow at train time, VERDICT r4 #8).  Overflowing batches
    are detected and counted (graph.py:collate warns; PaddedLoader
    aggregates) — this sizing only controls how often that happens.

    ``uniform=True``: sizes compatible with graph-uniform blocking
    (n_pad/e_pad divisible by batch_size, per-graph capacity = the sampled
    max + safety).  ``fixed_degree=True``: e_pad = n_pad * max_neighbors
    (every node owns exactly max_neighbors edge slots — collate
    fixed_degree layout)."""
    from .graph import radius_graph, radius_graph_pbc

    rng = np.random.default_rng(0)
    idx = rng.choice(len(dataset), size=min(sample, len(dataset)), replace=False)
    n_max, e_max = 1, 1
    for i in idx:
        s = dataset[int(i)]
        n_max = max(n_max, s.pos.shape[0])
        if s.pbc and s.cell is not None:
            src, _, _ = radius_graph_pbc(
                s.pos.astype(np.float64), s.cell, cutoff, max_neighbors
            )
        else:
            src, _, _ = radius_graph(
                s.pos.astype(np.float64), cutoff, max_neighbors
            )
        e_max = max(e_max, src.size)
    if fixed_degree:
        if max_neighbors is None:
            raise ValueError("fixed_degree pad sizing needs max_neighbors")
        n_slot = int(np.ceil(n_max * safety / 4)) * 4
        return batch_size * n_slot, batch_size * n_slot * max_neighbors
    if uniform:
        n_slot = int(np.ceil(n_max * safety / 4)) * 4
        e_slot = int(np.ceil(e_max * safety / 32)) * 32
        return batch_size * n_slot, batch_size * e_slot
    n_pad = int(np.ceil(batch_size * n_max * safety / 8)) * 8
    e_pad = int(np.ceil(batch_size * e_max * safety / 128)) * 128
    return n_pad, e_pad


class PaddedLoader:
    """Iterate a dataset as static-shape PaddedBatches.

    Args:
        dataset: indexable of GraphSample.
        indices: subset to iterate (None = all).
        drop_last: keep static batch size by dropping the ragged tail.
        prefetch: number of batches built ahead on a daemon thread.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        cutoff: float,
        max_neighbors: int | None,
        n_pad: int,
        e_pad: int,
        indices: Sequence[int] | None = None,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        uniform: bool = False,
        fixed_degree: bool = False,
        num_shards: int = 1,
        shard_id: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.cutoff = cutoff
        self.max_neighbors = max_neighbors
        self.n_pad = n_pad
        self.e_pad = e_pad
        self.indices = (
            np.asarray(indices) if indices is not None else np.arange(len(dataset))
        )
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.uniform = uniform
        self.fixed_degree = fixed_degree
        # multi-host: each process iterates a strided shard of the (shared-
        # seed) shuffled index list — DistributedSampler semantics (reference
        # train_oc20v2_parallel.py:334-349; parallel/multihost.py:host_shard)
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.epoch = 0
        # per-epoch overflow counters (reset at the start of each __iter__;
        # see graph.py:collate — non-zero means batches lost atoms/edges)
        self.overflow_atoms = 0
        self.overflow_edges = 0
        self.overflow_batches = 0

    def __len__(self):
        n = len(range(self.shard_id, len(self.indices), self.num_shards))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _index_batches(self):
        idx = self.indices.copy()
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        if self.num_shards > 1:
            idx = idx[self.shard_id :: self.num_shards]
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size]

    def _build(self, batch_idx) -> PaddedBatch:
        samples = [self.dataset[int(i)] for i in batch_idx]
        pb = collate(
            samples, self.cutoff, self.max_neighbors, self.n_pad, self.e_pad,
            uniform=self.uniform, fixed_degree=self.fixed_degree,
        )
        if pb.overflow_atoms or pb.overflow_edges:
            self.overflow_atoms += pb.overflow_atoms
            self.overflow_edges += pb.overflow_edges
            self.overflow_batches += 1
        return pb

    def __iter__(self) -> Iterator[PaddedBatch]:
        self.overflow_atoms = 0
        self.overflow_edges = 0
        self.overflow_batches = 0
        if self.prefetch <= 0:
            for bi in self._index_batches():
                yield self._build(bi)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for bi in self._index_batches():
                    q.put(self._build(bi))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
