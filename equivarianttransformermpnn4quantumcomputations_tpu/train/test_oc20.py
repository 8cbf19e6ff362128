"""OC20 checkpoint evaluation CLI — counterpart of reference test_oc20.py /
test_oc20v2.py.

(Both reference scripts are miscopied QM9 evaluators — they import
``EquiformerV2_QM9`` and denormalize with QM9 stats, see reference
models/test_oc20v2.py:23-31 — so this CLI implements what they *intend*:
load a checkpoint, rebuild the model from its stored config (the protocol of
reference test_qm9v3.py:33-92), and report S2EF energy/force MAE in OCP
units: |Δ|·std with the hardcoded OCP normalization, reference
data_loader_oc20v2.py:21-24.)

Usage::

    python -m ...train.test_oc20 --checkpoint runs/oc20/best --split val
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--run-dir", default=None)
    parser.add_argument("--data-path", default=None,
                        help="override the eval dataset path")
    parser.add_argument("--split", default="val", choices=["val", "test"])
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data.loader import PaddedLoader, infer_pad_sizes
    from ..data.oc20 import OC20Dataset, OC20LmdbDataset
    from .checkpoint import CheckpointManager
    from .schedules import warmup_cosine
    from .train_oc20 import build_oc20_model, evaluate
    from .trainer import create_train_state, make_optimizer

    run_dir = args.run_dir or os.path.dirname(args.checkpoint) or "."
    name = os.path.basename(args.checkpoint)
    ckpt = CheckpointManager(run_dir)
    with open(os.path.join(run_dir, f"{name}.meta.json")) as f:
        cfg = json.load(f)["config"]

    if cfg.get("synthetic") and args.data_path is None:
        from ..data.synthetic import SyntheticCrystals

        ds = SyntheticCrystals(
            n_samples=cfg.get("n_samples", 32), n_atoms=cfg.get("n_atoms", 6)
        )
    else:
        path = args.data_path or cfg.get("val_path") or cfg["data_path"]
        ds_cls = (
            OC20LmdbDataset if str(path).endswith(".lmdb") else OC20Dataset
        )
        ds = ds_cls(path)
    # layout must match the model build_oc20_model produces from cfg
    fixed_degree = cfg.get("fixed_degree", True)
    n_pad, e_pad = infer_pad_sizes(
        ds, cfg["cutoff"], cfg["max_neighbors"], cfg["batch_size"],
        fixed_degree=fixed_degree,
    )
    loader = PaddedLoader(
        ds, cfg["batch_size"], cfg["cutoff"], cfg["max_neighbors"], n_pad,
        e_pad, fixed_degree=fixed_degree,
    )

    model = build_oc20_model(cfg)
    first = next(iter(loader))
    fb = {k: jnp.asarray(v) for k, v in first.asdict().items()}
    params0 = model.init(jax.random.PRNGKey(0), fb)
    # the optimizer hyperparameters shape the opt_state TREE (weight_decay>0
    # adds a mask node) — rebuild from the checkpointed config so orbax's
    # structure check passes
    tx = make_optimizer(
        warmup_cosine(cfg.get("lr", 1e-3), 10, 100),
        cfg.get("weight_decay", 0.0),
        cfg.get("grad_clip", 1.0),
    )
    state0 = create_train_state(params0, tx)
    state, meta = ckpt.restore(name, state0)
    print(f"checkpoint: epoch {meta.get('epoch')}, score {meta.get('score')}")

    e_mae, f_mae = evaluate(model, state.ema_params, loader)

    print(f"\nOC20 S2EF {args.split} ({len(ds)} frames):")
    print(f"  energy MAE: {e_mae * 1000:.1f} meV")
    print(f"  force  MAE: {f_mae * 1000:.1f} meV/A")

    out = {
        "split": args.split,
        "n_frames": len(ds),
        "energy_mae_mev": float(e_mae) * 1000,
        "force_mae_mev_per_a": float(f_mae) * 1000,
    }
    with open(os.path.join(run_dir, f"eval_oc20_{args.split}.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
