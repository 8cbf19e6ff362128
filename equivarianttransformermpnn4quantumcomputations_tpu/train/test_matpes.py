"""MatPES checkpoint evaluation CLI — counterpart of reference test_MatPES.py
/ test_MatPES_GATA.py.

Loads a checkpoint, rebuilds the model from its stored config, evaluates
energy (meV/atom) and force (meV/A) MAE with autograd forces, cross-checks
the stored energy_std (reference :221-224), and prints the comparison table
against literature baselines (reference :155-181).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# literature anchors printed by the reference (test_MatPES.py:158-160)
LITERATURE = [
    ("M3GNet", 0.11, 0.97),
    ("CHGNet", 0.082, 0.91),
    ("TensorNet", 0.081, 0.93),
]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--run-dir", default=None)
    parser.add_argument("--split", default="test", choices=["val", "test"])
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data.loader import PaddedLoader, infer_pad_sizes
    from ..data.matpes import load_matpes
    from ..models.matpes import EquiformerV2MatPES
    from .checkpoint import CheckpointManager
    from .schedules import warmup_cosine
    from .train_matpes import evaluate
    from .trainer import create_train_state, make_optimizer

    run_dir = args.run_dir or os.path.dirname(args.checkpoint) or "."
    name = os.path.basename(args.checkpoint)
    ckpt = CheckpointManager(run_dir)
    with open(os.path.join(run_dir, f"{name}.meta.json")) as f:
        cfg = json.load(f)["config"]

    if cfg.get("synthetic"):
        # synthetic-LJ checkpoints (train_matpes --config synthetic*)
        from ..data.synthetic import SyntheticCrystals

        train_ds = SyntheticCrystals(n_samples=cfg.get("max_train") or 64)
        val_ds = test_ds = SyntheticCrystals(
            n_samples=cfg.get("max_val") or 16, seed=1,
            stats=train_ds.stats,
        )
        stats = {"energy_mean": 0.0, "energy_std": 1.0}
    else:
        train_ds, val_ds, test_ds, stats = load_matpes(
            cfg["data_path"], cfg.get("split_path"), cfg.get("cache_dir"),
            cfg.get("max_train"), cfg.get("max_val"), cfg.get("max_test"),
        )
    # energy_std consistency check (reference test_MatPES.py:221-224)
    if "energy_std" in cfg:
        drift = abs(stats["energy_std"] - cfg["energy_std"])
        if drift > 1e-6:
            print(
                f"WARNING: recomputed energy_std {stats['energy_std']:.6f} "
                f"!= checkpoint {cfg['energy_std']:.6f}"
            )
            stats["energy_std"] = cfg["energy_std"]
    ds = test_ds if args.split == "test" else val_ds
    fixed_degree = cfg.get("fixed_degree", True)
    n_pad, e_pad = infer_pad_sizes(
        ds, cfg["cutoff"], cfg["max_neighbors"], cfg["batch_size"],
        fixed_degree=fixed_degree,
    )
    loader = PaddedLoader(
        ds, cfg["batch_size"], cfg["cutoff"], cfg["max_neighbors"], n_pad,
        e_pad, fixed_degree=fixed_degree,
    )

    model = EquiformerV2MatPES(
        num_layers=cfg["num_layers"],
        sphere_channels=cfg["sphere_channels"],
        attn_hidden_channels=cfg["attn_hidden_channels"],
        num_heads=cfg["num_heads"],
        attn_alpha_channels=cfg["attn_alpha_channels"],
        attn_value_channels=cfg["attn_value_channels"],
        ffn_hidden_channels=cfg["ffn_hidden_channels"],
        lmax=cfg["lmax"],
        mmax=cfg["mmax"],
        grid_resolution=cfg["grid_resolution"],
        edge_channels=cfg["edge_channels"],
        num_rbf=cfg["num_rbf"],
        max_num_elements=cfg["max_num_elements"],
        cutoff=cfg["cutoff"],
        avg_degree=cfg["avg_degree"],
        gata=cfg["gata"],
        fixed_degree=fixed_degree,
        normalize_attn_output=cfg.get("normalize_attn_output", True),
        use_phi_every_layer=cfg.get("use_phi_every_layer", False),
        # param-tree structure must match the checkpoint's (scan stacks
        # block params under 'blocks')
        scan_layers=cfg.get("scan_layers", True),
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
    state, _ = ckpt.restore(name, state0)

    e_mae, f_mae = evaluate(model, state.ema_params, loader, stats["energy_std"])

    print(f"\nMatPES {args.split}:")
    print(f"  energy MAE: {e_mae:.2f} meV/atom")
    print(f"  force  MAE: {f_mae:.2f} meV/A")
    print("\nComparison (MatCalc-Benchmark energy MAE, eV/atom):")
    for nm, e, fr in LITERATURE:
        print(f"  {nm:10s}: {e:.3f} (f/f_DFT {fr:.2f})")
    print(f"  {'this work':10s}: {e_mae/1000:.4f}")

    with open(os.path.join(run_dir, f"eval_{args.split}.json"), "w") as f:
        json.dump(
            {"energy_mae_mev_per_atom": float(e_mae),
             "force_mae_mev_per_a": float(f_mae)},
            f, indent=2,
        )


if __name__ == "__main__":
    main()
