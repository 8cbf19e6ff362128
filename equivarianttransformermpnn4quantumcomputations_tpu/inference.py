"""Inference / serving API: load a checkpoint, predict energies and forces.

The reference exposes no serving path (only eval CLIs); for production use
this provides:
* ``Predictor`` — restore a MatPES-family checkpoint and serve
  energy/forces(/stress) for structures, with shape-bucketed jit caching so
  repeated calls hit compiled executables;
* ``predict_batch`` — padded batched prediction over many structures.

Example:
    p = Predictor.from_checkpoint("runs/matpes_gata", "ckpt_best")
    out = p.predict(atomic_numbers, positions, cell=cell)
    out["energy"], out["forces"]
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

__all__ = ["Predictor"]

_MODEL_KEYS = (
    "num_layers", "sphere_channels", "attn_hidden_channels", "num_heads",
    "attn_alpha_channels", "attn_value_channels", "ffn_hidden_channels",
    "lmax", "mmax", "grid_resolution", "edge_channels", "num_rbf",
    "max_num_elements", "cutoff", "avg_degree", "gata",
)


def _bucket(n: int, quantum: int = 16) -> int:
    return max(quantum, -(-n // quantum) * quantum)


class Predictor:
    def __init__(self, model, params, cutoff: float, max_neighbors: int | None,
                 energy_mean: float = 0.0, energy_std: float = 1.0):
        self.model = model
        self.params = params
        self.cutoff = cutoff
        self.max_neighbors = max_neighbors
        self.energy_mean = energy_mean
        self.energy_std = energy_std
        self._jitted = {}

    @classmethod
    def from_checkpoint(cls, run_dir: str, name: str = "ckpt_best",
                        use_ema: bool = True):
        import jax
        import jax.numpy as jnp

        from .data.graph import GraphSample, collate
        from .models.matpes import EquiformerV2MatPES
        from .train.checkpoint import CheckpointManager
        from .train.schedules import warmup_cosine
        from .train.trainer import create_train_state, make_optimizer

        with open(os.path.join(run_dir, f"{name}.meta.json")) as f:
            cfg = json.load(f)["config"]
        kwargs = {k: cfg[k] for k in _MODEL_KEYS if k in cfg}
        model = EquiformerV2MatPES(
            **kwargs,
            normalize_attn_output=cfg.get("normalize_attn_output", True),
            use_phi_every_layer=cfg.get("use_phi_every_layer", False),
            alpha_drop=0.0,
            drop_path_rate=0.0,
        )
        # template init to build the param structure, then restore
        rng = np.random.default_rng(0)
        s = GraphSample(
            atomic_numbers=np.array([1, 6, 8], np.int32),
            pos=rng.normal(size=(3, 3)).astype(np.float32) * 1.5,
        )
        pb = collate([s], cfg["cutoff"], cfg.get("max_neighbors"), 8, 64)
        fb = {k: jnp.asarray(v) for k, v in pb.asdict().items()}
        params0 = model.init(jax.random.PRNGKey(0), fb)
        tx = make_optimizer(warmup_cosine(1e-3, 1, 2))
        state0 = create_train_state(params0, tx)
        mgr = CheckpointManager(run_dir)
        state, _ = mgr.restore(name, state0)
        params = state.ema_params if use_ema else state.params
        return cls(
            model, params, cfg["cutoff"], cfg.get("max_neighbors"),
            cfg.get("energy_mean", 0.0), cfg.get("energy_std", 1.0),
        )

    def _get_fn(self, n_pad: int, e_pad: int):
        import jax

        from .models.matpes import matpes_energy_forces_stress

        key = (n_pad, e_pad)
        if key not in self._jitted:
            def fn(params, batch):
                return matpes_energy_forces_stress(self.model, params, batch)

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def predict(self, atomic_numbers, positions, cell=None):
        """Single-structure energy (denormalized, total eV) + forces."""
        out = self.predict_batch(
            [
                dict(
                    atomic_numbers=np.asarray(atomic_numbers, np.int32),
                    positions=np.asarray(positions, np.float32),
                    cell=None if cell is None else np.asarray(cell, np.float32),
                )
            ]
        )
        return {k: v[0] for k, v in out.items()}

    def predict_batch(self, structures: Sequence[dict]):
        import jax.numpy as jnp

        from .data.graph import GraphSample, collate, radius_graph, radius_graph_pbc

        samples = []
        max_e = 1
        n_tot = 0
        for s in structures:
            pbc = s.get("cell") is not None
            gs = GraphSample(
                atomic_numbers=s["atomic_numbers"],
                pos=s["positions"],
                cell=s.get("cell"),
                pbc=pbc,
            )
            samples.append(gs)
            n_tot += gs.pos.shape[0]
            if pbc:
                src, _, _ = radius_graph_pbc(
                    gs.pos.astype(np.float64), gs.cell, self.cutoff,
                    self.max_neighbors,
                )
            else:
                src, _, _ = radius_graph(
                    gs.pos.astype(np.float64), self.cutoff, self.max_neighbors
                )
            max_e += src.size
        n_pad = _bucket(n_tot + 1)
        e_pad = _bucket(max_e, 128)
        pb = collate(samples, self.cutoff, self.max_neighbors, n_pad, e_pad)
        batch = {k: jnp.asarray(v) for k, v in pb.asdict().items()}
        outs = self._get_fn(n_pad, e_pad)(self.params, batch)

        natoms = np.asarray(pb.natoms)
        e_per_atom = (
            np.asarray(outs["energy"][:, 0]) * self.energy_std
            + self.energy_mean
        )
        forces = np.asarray(outs["forces"]) * self.energy_std
        energies = e_per_atom * natoms
        out_forces = []
        off = 0
        for n in natoms:
            out_forces.append(forces[off : off + n])
            off += n
        return {
            "energy": energies,
            "energy_per_atom": e_per_atom,
            "forces": out_forces,
        }
