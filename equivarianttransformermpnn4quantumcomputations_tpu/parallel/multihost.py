"""Multi-host (multi-process) execution: env init + rank-0 discipline.

TPU-native counterpart of the reference's torch.distributed bootstrap
(models/train_oc20v2_parallel.py:34-54 reads RANK / WORLD_SIZE /
MASTER_ADDR / MASTER_PORT and calls init_process_group; :334-349 shards the
dataset per rank with DistributedSampler; :513-535 writes checkpoints and
logs on rank 0 only).

On TPU pods the same job shape is: one Python process per host, each seeing
its local chips; ``jax.distributed.initialize`` wires them into one global
runtime and every ``jit`` over a global ``Mesh`` spans all hosts (GSPMD
inserts the ICI/DCN collectives).  This module:

* ``initialize_from_env()`` — calls ``jax.distributed.initialize`` from the
  same env-var contract the reference uses (plus JAX's native
  ``COORDINATOR_ADDRESS``/... names), and is a NO-OP when the job is
  single-process (WORLD_SIZE unset or 1) — so every trainer can call it
  unconditionally.
* ``process_index()`` / ``process_count()`` / ``is_primary()`` — rank
  helpers that work before/without initialization.
* ``host_shard()`` — the DistributedSampler analog: per-epoch, per-host
  index subsets (used by data.loader.PaddedLoader via num_shards/shard_id).
"""

from __future__ import annotations

import os

__all__ = [
    "initialize_from_env",
    "process_index",
    "process_count",
    "is_primary",
    "host_shard",
]

_initialized = False


def _env(*names: str, default: str | None = None) -> str | None:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return default


def initialize_from_env(verbose: bool = True) -> bool:
    """Initialize jax.distributed from env vars; no-op for 1-process jobs.

    Env contract (first match wins):
      world size:  WORLD_SIZE | ETQ_NUM_PROCESSES | JAX_NUM_PROCESSES
      rank:        RANK | ETQ_PROCESS_ID | JAX_PROCESS_ID
      coordinator: MASTER_ADDR[:MASTER_PORT] | ETQ_COORDINATOR |
                   JAX_COORDINATOR_ADDRESS
    Matches the reference contract (train_oc20v2_parallel.py:34-54).
    Returns True if a multi-process runtime was initialized.
    """
    global _initialized
    if _initialized:
        return True
    world = int(_env("WORLD_SIZE", "ETQ_NUM_PROCESSES",
                     "JAX_NUM_PROCESSES", default="1"))
    if world <= 1:
        return False
    rank = int(_env("RANK", "ETQ_PROCESS_ID", "JAX_PROCESS_ID", default="0"))
    coord = _env("ETQ_COORDINATOR", "JAX_COORDINATOR_ADDRESS")
    if coord is None:
        addr = _env("MASTER_ADDR", default="127.0.0.1")
        port = _env("MASTER_PORT", default="12355")
        coord = f"{addr}:{port}"

    import jax

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=world, process_id=rank
    )
    _initialized = True
    if verbose and rank == 0:
        print(
            f"multihost: initialized {world} processes @ {coord}; "
            f"global devices: {jax.device_count()}"
        )
    return True


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns logging/checkpoint writes (rank 0)."""
    return process_index() == 0


def host_shard(n: int, num_shards: int | None = None,
               shard_id: int | None = None) -> slice:
    """Strided per-host subset of range(n) — DistributedSampler semantics
    (reference train_oc20v2_parallel.py:334-349): shard k takes indices
    k, k+S, k+2S, ... after the (shared-seed) shuffle."""
    if num_shards is None:
        num_shards = process_count()
    if shard_id is None:
        shard_id = process_index()
    return slice(shard_id, n, num_shards)
