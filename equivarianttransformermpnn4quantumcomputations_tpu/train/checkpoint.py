"""Checkpointing: orbax-backed, reference-schema-compatible, atomic, rotating.

Mirror of the reference checkpoint behavior
(train_MatPES_GATAWandB.py:41-62,322-372,484-500):
* schema: step/epoch, params, opt_state, ema_params, normalization stats,
  config, loss history — enough to rebuild the model purely from the
  checkpoint (reference test_qm9v3.py:33-92 rebuilds from ckpt['config']);
* atomic writes (orbax writes to a tmp dir then renames — same guarantee as
  the reference's tmp + os.replace);
* best + periodic checkpoints with retention of the last 2 periodic
  (reference :492-500);
* SIGTERM emergency save for preemptible runs (reference :341-372).
"""

from __future__ import annotations

import json
import os
import shutil
import signal
from typing import Any, Callable, Mapping

import numpy as np

__all__ = ["CheckpointManager", "install_sigterm_checkpoint"]


def _save_pytree(path: str, tree) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def _restore_pytree(path: str, target):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


class CheckpointManager:
    def __init__(self, run_dir: str, config: Mapping[str, Any] | None = None,
                 keep_periodic: int = 2, primary: bool = True):
        # multi-host rank-0 discipline: only the primary process writes
        # (reference train_oc20v2_parallel.py:513-535); restore works on all.
        self.primary = primary
        self.run_dir = run_dir
        if primary:
            os.makedirs(run_dir, exist_ok=True)
        self.keep_periodic = keep_periodic
        self.config = dict(config or {})

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.run_dir, f"{name}.meta.json")

    def save(self, name: str, state, extra: Mapping[str, Any] | None = None):
        """Save a TrainState + json-serializable metadata under ``name``."""
        if not self.primary:
            return
        path = os.path.join(self.run_dir, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        _save_pytree(path, state)
        meta = {"config": self.config, **(dict(extra) if extra else {})}
        tmp = self._meta_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, default=str)
        os.replace(tmp, self._meta_path(name))

    def save_periodic(self, epoch: int, state, extra=None):
        name = f"ckpt_epoch_{epoch:05d}"
        self.save(name, state, {**(extra or {}), "epoch": epoch})
        # rotate: keep last `keep_periodic`
        periodic = sorted(
            d for d in os.listdir(self.run_dir)
            if d.startswith("ckpt_epoch_") and not d.endswith(".json")
        )
        for old in periodic[: -self.keep_periodic]:
            shutil.rmtree(os.path.join(self.run_dir, old), ignore_errors=True)
            try:
                os.remove(self._meta_path(old))
            except OSError:
                pass

    def save_best(self, state, extra=None):
        self.save("ckpt_best", state, extra)

    def restore(self, name: str, target_state):
        state = _restore_pytree(os.path.join(self.run_dir, name), target_state)
        meta = {}
        if os.path.exists(self._meta_path(name)):
            with open(self._meta_path(name)) as f:
                meta = json.load(f)
        return state, meta

    def latest_name(self) -> str | None:
        cands = sorted(
            d for d in os.listdir(self.run_dir)
            if d.startswith("ckpt_epoch_") and not d.endswith(".json")
        )
        if os.path.isdir(os.path.join(self.run_dir, "ckpt_emergency")):
            return "ckpt_emergency"
        return cands[-1] if cands else None


def install_sigterm_checkpoint(get_state: Callable[[], Any], manager: CheckpointManager):
    """On SIGTERM, write an emergency checkpoint then exit (reference :341-372)."""

    def handler(signum, frame):
        try:
            state = get_state()
            manager.save("ckpt_emergency", state, {"reason": "sigterm"})
        finally:
            raise SystemExit(143)

    signal.signal(signal.SIGTERM, handler)
