"""OC20 S2EF training CLI — counterpart of reference train_oc20v2.py and the
DDP trainer train_oc20v2_parallel.py.

Single-chip by default; ``--data-parallel`` runs the shard_map DP step over
all visible devices (the XLA-collective analog of the reference's
DDP/NCCL trainer, see parallel/data_parallel.py).
Loss: E-MSE * w_energy + F-L1 * w_force (reference train_oc20v2), EMA 0.999,
per-step cosine+warmup.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def build_oc20_model(cfg):
    """EquiformerV2OC20 from a config dict — shared by the trainer and the
    standalone checkpoint-eval CLI (test_oc20.py), mirroring the reference's
    rebuild-from-``ckpt['config']`` protocol (test_oc20.py:33-92)."""
    from ..models.oc20 import EquiformerV2OC20

    return EquiformerV2OC20(
        fixed_degree=cfg.get("fixed_degree", True),
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
        avg_num_nodes=cfg["avg_num_nodes"],
        avg_degree=cfg["avg_degree"],
    )


import weakref

# weak-keyed: id() reuse after GC could hand a new model a dead model's
# jitted fn (VERDICT r4 #9; same pattern as train_matpes.py)
_EVAL_FWD_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def evaluate(model, params, loader):
    """Denormalized OC20 MAEs over a loader: (energy eV, force eV/A) in OCP
    units — |Δ|·std with the hardcoded OCP normalization (reference
    data_loader_oc20v2.py:21-24); force MAE masked to real atoms."""
    import jax
    import jax.numpy as jnp

    from ..data.oc20 import OC20_ENERGY_STD

    # jitted apply cached per model instance so per-epoch validation in the
    # trainer does not retrace
    eval_fwd = _EVAL_FWD_CACHE.get(model)
    if eval_fwd is None:
        eval_fwd = jax.jit(
            lambda p, batch: model.apply(p, batch, deterministic=True)
        )
        _EVAL_FWD_CACHE[model] = eval_fwd

    e_err = f_err = 0.0
    e_cnt = f_cnt = 0
    for pb in loader:
        batch = {k: jnp.asarray(v) for k, v in pb.asdict().items()}
        outs = eval_fwd(params, batch)
        e_err += np.abs(
            np.asarray(outs["energy"]) - np.asarray(batch["energy"])
        ).sum()
        e_cnt += outs["energy"].shape[0]
        m = np.asarray(batch["node_mask"])
        f_err += np.abs(
            np.asarray(outs["forces"])[m] - np.asarray(batch["forces"])[m]
        ).sum()
        f_cnt += int(m.sum()) * 3
    e_mae = e_err / max(e_cnt, 1) * OC20_ENERGY_STD
    f_mae = f_err / max(f_cnt, 1) * OC20_ENERGY_STD
    return e_mae, f_mae


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="default")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--run-dir", default=None)
    parser.add_argument("--data-parallel", action="store_true")
    parser.add_argument(
        "--multihost", action="store_true",
        help="jax.distributed from RANK/WORLD_SIZE/MASTER_ADDR env (no-op "
             "single-process); per-host data shards, rank-0-only writes — "
             "the reference DDP contract (train_oc20v2_parallel.py:34-54)",
    )
    args = parser.parse_args(argv)

    from ..parallel import multihost

    if args.multihost:
        multihost.initialize_from_env()
    primary = multihost.is_primary() if args.multihost else True
    n_shards = multihost.process_count() if args.multihost else 1
    shard_id = multihost.process_index() if args.multihost else 0

    from ..configs import oc20 as oc_cfg

    cfg = {
        "default": oc_cfg.config,
        "debug": oc_cfg.config_debug,
        "synthetic": oc_cfg.config_synthetic,
    }[args.config].copy()
    if args.epochs is not None:
        cfg["epochs"] = args.epochs
    if args.run_dir is not None:
        cfg["run_dir"] = args.run_dir

    import jax
    import jax.numpy as jnp

    from ..data.loader import PaddedLoader, infer_pad_sizes
    from ..data.oc20 import OC20Dataset, OC20LmdbDataset
    from ..utils.logging import RunLogger
    from .checkpoint import CheckpointManager, install_sigterm_checkpoint
    from .schedules import warmup_cosine
    from .trainer import (
        init_params_host,
        create_train_state,
        make_oc20_train_step,
        make_optimizer,
        oc20_loss,
    )

    if cfg.get("synthetic"):
        # extxyz-free end-to-end path (LJ crystals; see data/synthetic.py)
        from ..data.synthetic import SyntheticCrystals

        train_ds = SyntheticCrystals(
            n_samples=cfg.get("n_samples", 32), n_atoms=cfg.get("n_atoms", 6)
        )
        val_ds = train_ds
    else:
        path = cfg["data_path"]
        ds_cls = (
            OC20LmdbDataset if str(path).endswith(".lmdb") else OC20Dataset
        )
        train_ds = ds_cls(path)
        val_ds = ds_cls(cfg["val_path"]) if cfg.get("val_path") else train_ds

    fixed_degree = cfg.get("fixed_degree", True)
    n_pad, e_pad = infer_pad_sizes(
        train_ds, cfg["cutoff"], cfg["max_neighbors"], cfg["batch_size"],
        fixed_degree=fixed_degree,
    )
    train_loader = PaddedLoader(
        train_ds, cfg["batch_size"], cfg["cutoff"], cfg["max_neighbors"],
        n_pad, e_pad, shuffle=True, seed=cfg["seed"],
        num_shards=n_shards, shard_id=shard_id, fixed_degree=fixed_degree,
    )
    val_loader = PaddedLoader(
        val_ds, cfg["batch_size"], cfg["cutoff"], cfg["max_neighbors"],
        n_pad, e_pad, fixed_degree=fixed_degree,
    )

    model = build_oc20_model(cfg)

    steps_per_epoch = max(len(train_loader), 1)
    sched = warmup_cosine(
        cfg["lr"], cfg["warmup_steps"], cfg["epochs"] * steps_per_epoch
    )
    tx = make_optimizer(sched, cfg["weight_decay"], cfg["grad_clip"])

    rng = jax.random.PRNGKey(cfg["seed"])
    first = next(iter(val_loader))
    fb = {k: jnp.asarray(v) for k, v in first.asdict().items()}
    params = init_params_host(model, rng, fb)
    state = create_train_state(params, tx)
    ckpt = CheckpointManager(cfg["run_dir"], cfg, primary=primary)
    if args.checkpoint:
        state, meta = ckpt.restore(args.checkpoint, state)
        print(f"resumed: epoch {meta.get('epoch')}")
    logger = RunLogger(cfg["run_dir"], cfg, primary=primary)
    latest = {"state": state}
    if primary:
        install_sigterm_checkpoint(lambda: latest["state"], ckpt)

    # the shared step-builder (trainer.py) — bench.py times the same code
    step_fn = make_oc20_train_step(
        model, tx, cfg["w_energy"], cfg["w_force"], cfg["ema_decay"],
    )

    if args.data_parallel and jax.device_count() > 1:
        # shard_map DP over all visible devices — the XLA-collective analog
        # of the reference DDP trainer (train_oc20v2_parallel.py)
        from ..parallel.data_parallel import (
            _apply_updates_factory,
            make_dp_train_step_from_loss,
            make_mesh,
            shard_batch,
            stack_microbatches,
        )

        mesh = make_mesh()
        ndev = mesh.devices.size

        def loss_grad(params, batch, drop_rng):
            def loss_fn(p):
                outs = model.apply(
                    p, batch, deterministic=False, rngs={"dropout": drop_rng}
                )
                loss, metrics = oc20_loss(
                    outs["energy"], batch["energy"], outs["forces"],
                    batch["forces"], batch["node_mask"],
                    cfg["w_energy"], cfg["w_force"],
                )
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return metrics, grads

        dp_step = jax.jit(
            make_dp_train_step_from_loss(
                loss_grad,
                _apply_updates_factory(tx, cfg["ema_decay"]),
                mesh,
            ),
            donate_argnums=(0,),
        )

        def batches(loader):
            # group ndev loader micro-batches per optimizer step (the
            # DistributedSampler analog: each device gets distinct data)
            buf = []
            for pb in loader:
                buf.append(pb.asdict())
                if len(buf) == ndev:
                    yield shard_batch(mesh, stack_microbatches(buf))
                    buf = []

        step = dp_step
    else:
        def batches(loader):
            import jax.numpy as jnp

            for pb in loader:
                yield {k: jnp.asarray(v) for k, v in pb.asdict().items()}

        step = jax.jit(step_fn, donate_argnums=(0,))

    best = np.inf
    step_count = 0
    for epoch in range(cfg["epochs"]):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        losses = []
        for batch in batches(train_loader):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub)
            losses.append(float(metrics["loss"]))
            latest["state"] = state
            step_count += 1
            if step_count % cfg["log_every"] == 0:
                logger.log_step(step_count, {"train/loss": losses[-1]})
        # validation: denormalized MAEs (OCP std)
        e_mae, f_mae = evaluate(model, state.ema_params, val_loader)
        dt = time.time() - t0
        print(
            f"epoch {epoch}: loss={np.mean(losses):.4f} "
            f"E={e_mae*1000:.1f} meV F={f_mae*1000:.1f} meV/A ({dt:.1f}s)"
        )
        logger.log_epoch(
            epoch,
            {"train_loss": np.mean(losses), "val_e_mae": e_mae,
             "val_f_mae": f_mae, "sec": dt},
        )
        score = e_mae + f_mae
        if score < best:
            best = score
            ckpt.save_best(state, {"epoch": epoch, "score": score})
        if (epoch + 1) % cfg["ckpt_every_epochs"] == 0:
            ckpt.save_periodic(epoch, state, {"score": score})
    logger.finalize()


if __name__ == "__main__":
    main()
