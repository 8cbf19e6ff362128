"""Run logging: CSV loss curves, metrics.json, optional Weights & Biases.

Mirror of the reference's observability surface
(train_qm9v3.py:394-417 config.json/metrics.json/losses.csv;
train_MatPES_GATAWandB.py:375-381 CSV append+flush per epoch, :420-482 W&B
per-50-step scalars and artifacts).  W&B is import-gated — zero-egress or
wandb-less environments silently fall back to file logging only.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Any, Mapping

__all__ = ["RunLogger"]


class RunLogger:
    def __init__(
        self,
        run_dir: str,
        config: Mapping[str, Any] | None = None,
        use_wandb: bool = False,
        wandb_project: str | None = None,
        wandb_run_id: str | None = None,
        primary: bool = True,
    ):
        # multi-host rank-0 discipline (reference train_oc20v2_parallel.py:
        # 513-535 logs on rank 0 only): non-primary processes keep the full
        # API but write nothing.
        self.primary = primary
        self.run_dir = run_dir
        if primary:
            os.makedirs(run_dir, exist_ok=True)
        self.t0 = time.time()
        self._csv_path = os.path.join(run_dir, "losses.csv")
        self._csv_file = None
        self._csv_writer = None
        self._metrics: dict[str, Any] = {}

        if config is not None and primary:
            with open(os.path.join(run_dir, "config.json"), "w") as f:
                json.dump(dict(config), f, indent=2, default=str)

        self.wandb = None
        if use_wandb and primary:
            try:
                import wandb

                self.wandb = wandb.init(
                    project=wandb_project or "etmpnn-tpu",
                    id=wandb_run_id,
                    resume="allow",
                    config=dict(config or {}),
                    dir=run_dir,
                )
            except Exception:
                self.wandb = None  # zero-egress: file logging only

    def log_step(self, step: int, scalars: Mapping[str, float]):
        if self.wandb is not None:
            self.wandb.log(dict(scalars), step=step)

    def log_epoch(self, epoch: int, scalars: Mapping[str, float]):
        if not self.primary:
            return
        row = {"epoch": epoch, **{k: float(v) for k, v in scalars.items()}}
        if self._csv_writer is None:
            exists = os.path.exists(self._csv_path)
            self._csv_file = open(self._csv_path, "a", newline="")
            self._csv_writer = csv.DictWriter(
                self._csv_file, fieldnames=list(row.keys())
            )
            if not exists:
                self._csv_writer.writeheader()
        self._csv_writer.writerow(row)
        self._csv_file.flush()
        if self.wandb is not None:
            self.wandb.log({f"epoch/{k}": v for k, v in row.items()})

    def log_model_artifact(
        self, path: str, name: str = "best-model", description: str = "",
    ):
        """Upload a checkpoint as a W&B model artifact (reference
        train_MatPES_GATAWandB.py:477-482).  No-op without wandb; always
        records the pointer in metrics.json so the artifact trail exists in
        file-only runs too."""
        if not self.primary:
            return
        self._metrics.setdefault("model_artifacts", []).append(
            {"name": name, "path": path, "description": description}
        )
        if self.wandb is not None:
            try:
                import wandb

                artifact = wandb.Artifact(
                    name=name, type="model", description=description
                )
                if os.path.isdir(path):
                    artifact.add_dir(path)
                else:
                    artifact.add_file(path)
                self.wandb.log_artifact(artifact)
            except Exception:
                pass  # zero-egress: pointer in metrics.json only

    def update_metrics(self, **kwargs):
        self._metrics.update(kwargs)

    def finalize(self):
        if not self.primary:
            return
        self._metrics["wall_time_sec"] = time.time() - self.t0
        with open(os.path.join(self.run_dir, "metrics.json"), "w") as f:
            json.dump(self._metrics, f, indent=2, default=str)
        if self._csv_file is not None:
            self._csv_file.close()
        if self.wandb is not None:
            self.wandb.finish()
