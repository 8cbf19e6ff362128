"""QM9 training CLI — TPU-native counterpart of reference train_qm9v3.py.

Usage:
    python -m equivarianttransformermpnn4quantumcomputations_tpu.train.train_qm9 \
        [--config debug] [--checkpoint runs/qm9/ckpt_best] [--epochs N]

Features mirrored from the reference trainer (train_qm9v3.py:71-424):
AdamW + warmup->cosine, L1/MSE loss, grad clip, best-val + periodic
checkpoints, config/metrics/losses.csv artifacts, resume.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def evaluate(model, params, loader, denorm=None):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(params, batch):
        return model.apply(params, batch, deterministic=True)

    if len(loader) == 0:
        raise ValueError(
            "evaluate: empty loader (fewer samples than batch_size after "
            "the split — shrink batch_size or raise the split fraction)"
        )
    abs_err_sum = None
    count = 0
    for pb in loader:
        batch = {k: jnp.asarray(v) for k, v in pb.asdict().items()}
        pred = np.asarray(fwd(params, batch))
        tgt = np.asarray(batch["y"])
        if denorm is not None:
            pred = denorm(pred)
            tgt = denorm(tgt)
        err = np.abs(pred - tgt).sum(axis=0)
        abs_err_sum = err if abs_err_sum is None else abs_err_sum + err
        count += pred.shape[0]
    return abs_err_sum / max(count, 1)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="default")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--epochs", type=int, default=None)
    args = parser.parse_args(argv)

    from ..configs import qm9 as qm9_cfg

    cfg = {
        "default": qm9_cfg.config,
        "debug": qm9_cfg.config_debug,
        "conservative": qm9_cfg.config_conservative,
        "aggressive": qm9_cfg.config_aggressive,
        "fixture": qm9_cfg.config_fixture,
    }[args.config].copy()
    if args.epochs is not None:
        cfg["epochs"] = args.epochs

    import jax
    import jax.numpy as jnp

    from ..data.loader import PaddedLoader, infer_pad_sizes
    from ..data.qm9 import QM9Dataset, qm9_random_split
    from ..models.qm9 import EquiformerV2QM9
    from ..utils.logging import RunLogger
    from .checkpoint import CheckpointManager, install_sigterm_checkpoint
    from .schedules import warmup_cosine
    from .trainer import create_train_state, init_params_host, make_optimizer, make_qm9_train_step

    dataset = QM9Dataset(
        cfg["db_path"],
        stats_json=cfg.get("stats_json"),
        max_samples=cfg.get("max_samples"),
        target_indices=cfg.get("target_indices"),
    )
    tr_idx, va_idx, te_idx = qm9_random_split(
        len(dataset), cfg["val_split"], cfg["test_split"]
    )
    fixed_degree = cfg.get("fixed_degree", True)
    n_pad, e_pad = infer_pad_sizes(
        dataset, cfg["cutoff"], cfg["max_neighbors"], cfg["batch_size"],
        fixed_degree=fixed_degree,
    )
    mk = lambda idx, shuf: PaddedLoader(
        dataset, cfg["batch_size"], cfg["cutoff"], cfg["max_neighbors"],
        n_pad, e_pad, indices=idx, shuffle=shuf, seed=cfg["seed"],
        fixed_degree=fixed_degree,
    )
    train_loader, val_loader = mk(tr_idx, True), mk(va_idx, False)

    n_targets = (
        len(cfg["target_indices"]) if cfg.get("target_indices") else 12
    )
    model = EquiformerV2QM9(
        num_targets=n_targets,
        fixed_degree=fixed_degree,
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
        alpha_drop=cfg["alpha_drop"],
        drop_path_rate=cfg["drop_path_rate"],
        avg_degree=cfg["avg_degree"],
    )

    steps_per_epoch = max(len(train_loader), 1)
    sched = warmup_cosine(
        cfg["lr"],
        cfg["warmup_epochs"] * steps_per_epoch,
        cfg["epochs"] * steps_per_epoch,
    )
    tx = make_optimizer(sched, cfg["weight_decay"], cfg["grad_clip"])

    rng = jax.random.PRNGKey(cfg["seed"])
    first = next(iter(mk(tr_idx[: cfg["batch_size"]], False)))
    fb = {k: jnp.asarray(v) for k, v in first.asdict().items()}
    params = init_params_host(model, rng, fb)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"model params: {n_params/1e6:.2f}M  pads: n={n_pad} e={e_pad}")

    state = create_train_state(params, tx)
    ckpt = CheckpointManager(cfg["run_dir"], cfg)
    if args.checkpoint:
        state, meta = ckpt.restore(args.checkpoint, state)
        print(f"resumed from {args.checkpoint}: {meta.get('epoch')}")
    logger = RunLogger(cfg["run_dir"], cfg)
    latest = {"state": state}
    install_sigterm_checkpoint(lambda: latest["state"], ckpt)

    step_fn = jax.jit(
        make_qm9_train_step(model, tx, cfg["loss"], cfg["ema_decay"]),
        donate_argnums=(0,),
    )

    denorm = lambda y: y * dataset.std + dataset.mean
    best_val = np.inf
    step_count = 0
    for epoch in range(cfg["epochs"]):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        losses = []
        for pb in train_loader:
            batch = {k: jnp.asarray(v) for k, v in pb.asdict().items()}
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
            losses.append(float(metrics["loss"]))
            latest["state"] = state
            step_count += 1
            if step_count % cfg["log_every"] == 0:
                logger.log_step(step_count, {"train/loss": losses[-1]})
        val_mae = evaluate(model, state.ema_params, val_loader, denorm)
        mean_val = float(np.mean(val_mae))
        dt = time.time() - t0
        print(
            f"epoch {epoch}: loss={np.mean(losses):.4f} "
            f"val_mae={mean_val:.4f} ({dt:.1f}s)"
        )
        logger.log_epoch(
            epoch,
            {"train_loss": np.mean(losses), "val_mae": mean_val, "sec": dt},
        )
        if mean_val < best_val:
            best_val = mean_val
            ckpt.save_best(state, {"epoch": epoch, "val_mae": mean_val})
        if (epoch + 1) % cfg["ckpt_every_epochs"] == 0:
            ckpt.save_periodic(epoch, state, {"val_mae": mean_val})

    logger.update_metrics(best_val_mae=best_val, num_params=n_params)
    logger.finalize()


if __name__ == "__main__":
    main()
