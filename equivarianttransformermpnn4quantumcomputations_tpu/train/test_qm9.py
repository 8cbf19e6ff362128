"""QM9 checkpoint evaluation CLI — counterpart of reference test_qm9v3.py.

Loads a checkpoint, rebuilds the model purely from the stored config
(reference test_qm9v3.py:33-92), and reports denormalized per-property MAE in
paper units (:95-130).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True, help="name in run_dir")
    parser.add_argument("--run-dir", default=None)
    parser.add_argument("--split", default="test", choices=["val", "test"])
    parser.add_argument("--use-ema", action="store_true", default=True)
    args = parser.parse_args(argv)

    import os

    import jax
    import jax.numpy as jnp

    from ..data.loader import PaddedLoader, infer_pad_sizes
    from ..data.qm9 import PROPERTY_ORDER, QM9Dataset, qm9_random_split
    from ..models.qm9 import EquiformerV2QM9
    from .checkpoint import CheckpointManager
    from .trainer import create_train_state, make_optimizer
    from .schedules import warmup_cosine

    run_dir = args.run_dir or os.path.dirname(args.checkpoint) or "."
    name = os.path.basename(args.checkpoint)
    ckpt = CheckpointManager(run_dir)
    with open(os.path.join(run_dir, f"{name}.meta.json")) as f:
        cfg = json.load(f)["config"]

    dataset = QM9Dataset(
        cfg["db_path"],
        stats_json=cfg.get("stats_json"),
        max_samples=cfg.get("max_samples"),
        target_indices=cfg.get("target_indices"),
    )
    tr, va, te = qm9_random_split(
        len(dataset), cfg["val_split"], cfg["test_split"]
    )
    idx = te if args.split == "test" else va
    fixed_degree = cfg.get("fixed_degree", True)
    n_pad, e_pad = infer_pad_sizes(
        dataset, cfg["cutoff"], cfg["max_neighbors"], cfg["batch_size"],
        fixed_degree=fixed_degree,
    )
    loader = PaddedLoader(
        dataset, cfg["batch_size"], cfg["cutoff"], cfg["max_neighbors"],
        n_pad, e_pad, indices=idx, fixed_degree=fixed_degree,
    )

    n_targets = (
        len(cfg["target_indices"]) if cfg.get("target_indices") else 12
    )
    model = EquiformerV2QM9(
        num_targets=n_targets,
        num_layers=cfg["num_layers"],
        sphere_channels=cfg["sphere_channels"],
        attn_hidden_channels=cfg["attn_hidden_channels"],
        num_heads=cfg["num_heads"],
        attn_alpha_channels=cfg["attn_alpha_channels"],
        attn_value_channels=cfg["attn_value_channels"],
        ffn_hidden_channels=cfg["ffn_hidden_channels"],
        lmax=cfg["lmax"],
        mmax=cfg["mmax"],
        edge_channels=cfg["edge_channels"],
        num_rbf=cfg["num_rbf"],
        max_num_elements=cfg["max_num_elements"],
        cutoff=cfg["cutoff"],
        avg_degree=cfg["avg_degree"],
        fixed_degree=fixed_degree,
    )
    first = next(iter(loader))
    fb = {k: jnp.asarray(v) for k, v in first.asdict().items()}
    params0 = model.init(jax.random.PRNGKey(0), fb)
    # rebuild the optimizer from the checkpointed config: weight_decay>0
    # adds a mask node to the opt_state tree, and orbax restore checks
    # structure
    tx = make_optimizer(
        warmup_cosine(cfg.get("lr", 1e-3), 10, 100),
        cfg.get("weight_decay", 0.0),
        cfg.get("grad_clip", 1.0),
    )
    state0 = create_train_state(params0, tx)
    state, meta = ckpt.restore(name, state0)
    params = state.ema_params if args.use_ema else state.params

    @jax.jit
    def fwd(params, batch):
        return model.apply(params, batch, deterministic=True)

    names = (
        [PROPERTY_ORDER[i] for i in cfg["target_indices"]]
        if cfg.get("target_indices")
        else PROPERTY_ORDER
    )
    mean, std = dataset.mean, dataset.std
    if cfg.get("target_indices"):
        mean = mean[np.asarray(cfg["target_indices"])]
        std = std[np.asarray(cfg["target_indices"])]

    err_sum = np.zeros(n_targets)
    count = 0
    all_pred, all_tgt = [], []
    for pb in loader:
        batch = {k: jnp.asarray(v) for k, v in pb.asdict().items()}
        pred = np.asarray(fwd(params, batch)) * std + mean
        tgt = np.asarray(batch["y"]) * std + mean
        all_pred.append(pred)
        all_tgt.append(tgt)
        err_sum += np.abs(pred - tgt).sum(axis=0)
        count += pred.shape[0]
    mae = err_sum / max(count, 1)
    # predictions/targets dumps (reference train_qm9v3.py:408-411)
    np.save(os.path.join(run_dir, "predictions.npy"), np.concatenate(all_pred))
    np.save(os.path.join(run_dir, "targets.npy"), np.concatenate(all_tgt))

    print(f"\nQM9 {args.split} MAE (paper units), {count} molecules:")
    for nm, m in zip(names, mae):
        print(f"  {nm:8s}: {m:.4f}")
    out = {"split": args.split, "count": count,
           "mae": {nm: float(m) for nm, m in zip(names, mae)}}
    with open(os.path.join(run_dir, f"eval_{args.split}.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
