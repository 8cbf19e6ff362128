"""C++ neighbor-list builder vs numpy reference: identical edge sets."""

import numpy as np
import pytest

from equivarianttransformermpnn4quantumcomputations_tpu.data import graph as G
from equivarianttransformermpnn4quantumcomputations_tpu.data.native import (
    native_available,
    neighbor_list_native,
)


def edge_set(src, dst, shift):
    return set(
        (int(s), int(d), int(a), int(b), int(c))
        for s, d, (a, b, c) in zip(src, dst, shift)
    )


@pytest.mark.skipif(not native_available(), reason="no g++ / native lib")
def test_native_matches_numpy_nonpbc():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(20, 3)) * 2.0
    nat = neighbor_list_native(pos, None, False, 3.0, None)
    G.USE_NATIVE = False
    try:
        ref = G.radius_graph(pos, 3.0, None)
    finally:
        G.USE_NATIVE = True
    assert edge_set(*nat) == edge_set(*ref)


@pytest.mark.skipif(not native_available(), reason="no g++ / native lib")
def test_native_matches_numpy_pbc():
    rng = np.random.default_rng(1)
    cell = np.array([[3.0, 0, 0], [0.4, 2.8, 0], [0, 0.3, 3.2]])
    pos = rng.uniform(0, 1, size=(8, 3)) @ cell
    nat = neighbor_list_native(pos, cell, True, 2.5, None)
    G.USE_NATIVE = False
    try:
        ref = G.radius_graph_pbc(pos, cell, 2.5, None)
    finally:
        G.USE_NATIVE = True
    assert edge_set(*nat) == edge_set(*ref)


@pytest.mark.skipif(not native_available(), reason="no g++ / native lib")
def test_native_max_neighbors_cap():
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(30, 3)) * 1.2
    k = 5
    nat = neighbor_list_native(pos, None, False, 4.0, k)
    src, dst, _ = nat
    # per-dst count <= k
    counts = np.bincount(dst, minlength=30)
    assert counts.max() <= k
    # kept edges are the k closest per dst (compare distances with numpy)
    G.USE_NATIVE = False
    try:
        rsrc, rdst, _ = G.radius_graph(pos, 4.0, k)
    finally:
        G.USE_NATIVE = True
    d_nat = np.sort(
        np.linalg.norm(pos[dst] - pos[src], axis=1)
    )
    d_ref = np.sort(np.linalg.norm(pos[rdst] - pos[rsrc], axis=1))
    assert np.allclose(d_nat, d_ref)
