"""Multi-host plumbing: env init contract, per-host data sharding, rank-0
write discipline (reference train_oc20v2_parallel.py:34-54,334-349,513-535).

A real 2-process run needs two JAX runtimes, which this environment cannot
host (single TPU tunnel client, single CPU core — see CLAUDE.md); the
process-dependent pieces are exercised by construction: initialize_from_env
is a verified no-op without env vars, sharding/discipline are driven with
explicit num_shards/shard_id/primary arguments, and the end-to-end
`--multihost --mesh data=2` single-process path runs in
test_train_cli_mesh_multihost (the same code path a pod job takes, with
process_count() == 1).
"""

import json
import os

import numpy as np
import pytest

from equivarianttransformermpnn4quantumcomputations_tpu.data.loader import (
    PaddedLoader,
)
from equivarianttransformermpnn4quantumcomputations_tpu.parallel import (
    multihost,
)


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("WORLD_SIZE", raising=False)
    monkeypatch.delenv("RANK", raising=False)
    assert multihost.initialize_from_env() is False
    assert multihost.process_count() == 1
    assert multihost.process_index() == 0
    assert multihost.is_primary()


def test_initialize_noop_world_size_one(monkeypatch):
    monkeypatch.setenv("WORLD_SIZE", "1")
    monkeypatch.setenv("RANK", "0")
    assert multihost.initialize_from_env() is False


def test_host_shard_partition():
    """Shards are disjoint and cover the index set (DistributedSampler
    semantics)."""
    n, S = 103, 4
    seen = []
    for k in range(S):
        seen.extend(range(n)[multihost.host_shard(n, S, k)])
    assert sorted(seen) == list(range(n))


def _dataset(n=24):
    from equivarianttransformermpnn4quantumcomputations_tpu.data.graph import (
        GraphSample,
    )

    rng = np.random.default_rng(0)
    return [
        GraphSample(
            atomic_numbers=rng.integers(1, 10, size=4).astype(np.int32),
            pos=rng.normal(size=(4, 3)).astype(np.float32) * 2,
            energy=float(i),
            forces=np.zeros((4, 3), np.float32),
        )
        for i in range(n)
    ]


def test_loader_sharding_partitions_dataset():
    ds = _dataset(24)
    S = 2

    def energies(shard_id):
        loader = PaddedLoader(
            ds, batch_size=2, cutoff=4.0, max_neighbors=10,
            n_pad=8, e_pad=64, shuffle=True, seed=3, prefetch=0,
            num_shards=S, shard_id=shard_id,
        )
        assert len(loader) == 24 // S // 2
        out = []
        for pb in loader:
            out.extend(np.asarray(pb.energy).tolist())
        return out

    e0, e1 = energies(0), energies(1)
    # disjoint and jointly covering (shuffle seed shared across shards)
    assert not (set(e0) & set(e1))
    assert sorted(e0 + e1) == sorted(float(i) for i in range(24))


def test_runlogger_nonprimary_writes_nothing(tmp_path):
    from equivarianttransformermpnn4quantumcomputations_tpu.utils.logging import (
        RunLogger,
    )

    run_dir = str(tmp_path / "run")
    lg = RunLogger(run_dir, {"a": 1}, primary=False)
    lg.log_step(1, {"loss": 1.0})
    lg.log_epoch(0, {"loss": 1.0})
    lg.log_model_artifact("x")
    lg.update_metrics(done=True)
    lg.finalize()
    assert not os.path.exists(run_dir)

    lg = RunLogger(run_dir, {"a": 1}, primary=True)
    lg.log_epoch(0, {"loss": 1.0})
    lg.finalize()
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    assert os.path.exists(os.path.join(run_dir, "losses.csv"))
    assert os.path.exists(os.path.join(run_dir, "metrics.json"))


def test_checkpoint_nonprimary_writes_nothing(tmp_path):
    from equivarianttransformermpnn4quantumcomputations_tpu.train.checkpoint import (
        CheckpointManager,
    )

    run_dir = str(tmp_path / "ckpt")
    cm = CheckpointManager(run_dir, {"cfg": 1}, primary=False)
    cm.save("ckpt_best", {"w": np.ones(3, np.float32)})
    assert not os.path.exists(run_dir)

    cm = CheckpointManager(run_dir, {"cfg": 1}, primary=True)
    state = {"w": np.ones(3, np.float32)}
    cm.save("ckpt_best", state, {"epoch": 0})
    restored, meta = cm.restore("ckpt_best", state)
    assert meta["epoch"] == 0
    np.testing.assert_array_equal(restored["w"], state["w"])


@pytest.mark.slow
def test_train_cli_mesh_multihost(tmp_path, monkeypatch):
    """End-to-end: the --multihost --mesh data=2 path of train_matpes runs
    single-process on the virtual CPU mesh (jax.distributed no-op, composite
    GSPMD step, microbatch stacking, primary-gated writes)."""
    from equivarianttransformermpnn4quantumcomputations_tpu.train import (
        train_matpes,
    )

    monkeypatch.delenv("WORLD_SIZE", raising=False)
    monkeypatch.chdir(tmp_path)
    train_matpes.main([
        "--config", "synthetic", "--epochs", "1",
        "--mesh", "data=2", "--multihost",
    ])
    run_dir = tmp_path / "runs" / "matpes_synthetic"
    assert (run_dir / "metrics.json").exists()
    with open(run_dir / "losses.csv") as f:
        assert len(f.readlines()) >= 2  # header + 1 epoch
    assert json.load(open(run_dir / "config.json"))["synthetic"]
