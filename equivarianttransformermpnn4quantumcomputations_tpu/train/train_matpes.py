"""MatPES training CLI — counterpart of reference train_MatPES_GATAWandB.py.

Covers the reference trainer family in one script via --config:
    default          GATA-V2 + HTR (train_MatPES_GATAWandB.py)
    baseline         original EFv2 w/ stress (train_MatPES_originalEFV2_WandB.py)
    no-attn-norm     ablation (train_MatPES_GATAWandB_no_norm_of_atten_output.py)
    phi-every-layer  (train_MatPES*phi_at_every_iteration*)
    debug            tiny fast run

Resume: --checkpoint <name-in-run-dir> (train_MatPES_GATAWandB_from_checkpoint.py).
NaN guard, EMA, SIGTERM emergency checkpoint, W&B-or-CSV logging included.
"""

from __future__ import annotations

import argparse
import os
import time

import weakref

import numpy as np


# weak-keyed (VERDICT r4 #9): an id()-keyed cache can hand a NEW model object
# a DEAD model's jitted fn after GC reuses the id.  flax Modules are frozen
# dataclasses but support weakref; entries die with their model.
_EVAL_FWD_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def evaluate(model, params, loader, energy_std: float):
    """Energy MAE (meV/atom) and force MAE (meV/A), denormalized
    (reference test_MatPES.py:89-152: MAE * std * 1000)."""
    import jax
    import jax.numpy as jnp

    from ..models.matpes import matpes_energy_forces_stress

    # jitted per model instance: eager energy+forces dispatches thousands of
    # ops per batch through the device tunnel (~40 s/batch on the flagship)
    eval_fwd = _EVAL_FWD_CACHE.get(model)
    if eval_fwd is None:
        eval_fwd = jax.jit(
            lambda p, batch: matpes_energy_forces_stress(model, p, batch)
        )
        _EVAL_FWD_CACHE[model] = eval_fwd

    e_err = f_err = 0.0
    e_cnt = f_cnt = 0
    for pb in loader:
        batch = {k: jnp.asarray(v) for k, v in pb.asdict().items()}
        outs = eval_fwd(params, batch)
        e_pred = np.asarray(outs["energy"][:, 0])
        e_tgt = np.asarray(batch["energy"])
        e_err += np.abs(e_pred - e_tgt).sum()
        e_cnt += e_pred.shape[0]
        m = np.asarray(batch["node_mask"])
        f_pred = np.asarray(outs["forces"])[m]
        f_tgt = np.asarray(batch["forces"])[m]
        f_err += np.abs(f_pred - f_tgt).sum()
        f_cnt += f_pred.size
    e_mae_mev = e_err / max(e_cnt, 1) * energy_std * 1000.0
    f_mae_mev = f_err / max(f_cnt, 1) * energy_std * 1000.0
    return e_mae_mev, f_mae_mev


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="default")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument(
        "--mixed-precision", action="store_true",
        help="bf16 compute, f32 master params/norms",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed from RANK/WORLD_SIZE/MASTER_ADDR "
             "env vars (no-op single-process); shard data per host, write "
             "logs/checkpoints on rank 0 only "
             "(reference train_oc20v2_parallel.py:34-54,334-349,513-535)",
    )
    parser.add_argument(
        "--mesh", default=None, metavar="data=N[,model=M|pipe=P][,sp]",
        help="train with a sharded step over a device mesh: 'data=4' is "
             "4-way DP (N microbatches/step), 'data=4,model=2' adds "
             "Megatron-style TP (+EP for MoE); ',sp' shards the edge axis; "
             "'data=2,pipe=2' instead runs DP x GPipe pipeline parallelism "
             "over the scanned layer stack (requires scan_layers=True, "
             "num_layers %% pipe == 0).  Omitted = single-device step.",
    )
    args = parser.parse_args(argv)

    from ..parallel import multihost

    if args.multihost:
        multihost.initialize_from_env()
    primary = multihost.is_primary() if args.multihost else True

    mesh_spec = None
    if args.mesh:
        mesh_spec = {"data": 1, "model": 1, "pipe": 1, "sp": False}
        for part in args.mesh.split(","):
            if part.strip() == "sp":
                mesh_spec["sp"] = True
            else:
                k, v = part.split("=")
                mesh_spec[k.strip()] = int(v)
        if mesh_spec["pipe"] > 1 and mesh_spec["model"] > 1:
            parser.error("--mesh: pipe and model axes cannot be combined")

    from ..configs import matpes as mp_cfg

    cfg = {
        "default": mp_cfg.config,
        "debug": mp_cfg.config_debug,
        "no-attn-norm": mp_cfg.config_no_attn_norm,
        "phi-every-layer": mp_cfg.config_phi_every_layer,
        "baseline": mp_cfg.config_baseline_efv2,
        "synthetic": {
            **mp_cfg.config_debug,
            "synthetic": True,
            "max_train": 48,
            "max_val": 16,
            "cutoff": 5.0,
            "run_dir": "runs/matpes_synthetic",
        },
        "synthetic-convergence": mp_cfg.config_synthetic_convergence,
        "fixture": mp_cfg.config_fixture,
    }[args.config].copy()
    if args.epochs is not None:
        cfg["epochs"] = args.epochs

    import jax
    import jax.numpy as jnp

    # bf16 step (f32 master params/norms) is the production default on TPU
    # (configs/matpes.py 'mixed_precision'); --mixed-precision forces it on
    mixed_precision = bool(
        args.mixed_precision or cfg.get("mixed_precision", False)
    )

    # persistent XLA compile cache: the production config unrolls the layer
    # stack (5-30 min first compile through the remote compiler) — cache it
    # across restarts/resumes so only the first launch pays
    try:
        cache_dir = cfg.get(
            "compile_cache_dir", os.path.expanduser("~/.cache/etq_xla")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from ..data.loader import PaddedLoader, infer_pad_sizes
    from ..data.matpes import load_matpes
    from ..models.matpes import EquiformerV2MatPES
    from ..utils.logging import RunLogger
    from .checkpoint import CheckpointManager, install_sigterm_checkpoint
    from .schedules import warmup_cosine
    from .trainer import create_train_state, init_params_host, make_matpes_train_step, make_optimizer

    if cfg.get("synthetic"):
        # pymatgen-free end-to-end path (LJ crystals; see data/synthetic.py)
        from ..data.synthetic import SyntheticCrystals

        train_ds = SyntheticCrystals(n_samples=cfg.get("max_train") or 64)
        # val shares the TRAIN normalization (per-seed self-normalization
        # made val MAEs incomparable to the train loss)
        val_ds = SyntheticCrystals(
            n_samples=cfg.get("max_val") or 16, seed=1,
            stats=train_ds.stats,
        )
        stats = {"energy_mean": 0.0, "energy_std": 1.0}
    else:
        train_ds, val_ds, test_ds, stats = load_matpes(
            cfg["data_path"],
            cfg.get("split_path"),
            cfg.get("cache_dir"),
            cfg.get("max_train"),
            cfg.get("max_val"),
            cfg.get("max_test"),
        )
    uniform = cfg.get("uniform_blocks", True)
    fixed_degree = cfg.get("fixed_degree", True)
    n_pad, e_pad = infer_pad_sizes(
        train_ds, cfg["cutoff"], cfg["max_neighbors"], cfg["batch_size"],
        uniform=uniform, fixed_degree=fixed_degree,
    )
    n_shards = multihost.process_count() if args.multihost else 1
    shard_id = multihost.process_index() if args.multihost else 0
    mk = lambda ds, shuf, sharded=False: PaddedLoader(
        ds, cfg["batch_size"], cfg["cutoff"], cfg["max_neighbors"],
        n_pad, e_pad, shuffle=shuf, seed=cfg["seed"], uniform=uniform,
        fixed_degree=fixed_degree,
        num_shards=n_shards if sharded else 1,
        shard_id=shard_id if sharded else 0,
    )
    train_loader, val_loader = mk(train_ds, True, sharded=True), mk(val_ds, False)

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
        alpha_drop=cfg["alpha_drop"],
        drop_path_rate=cfg["drop_path_rate"],
        avg_degree=cfg["avg_degree"],
        gata=cfg["gata"],
        normalize_attn_output=cfg.get("normalize_attn_output", True),
        use_phi_every_layer=cfg.get("use_phi_every_layer", False),
        compute_dtype="bfloat16" if mixed_precision else "float32",
        uniform_blocks=uniform,
        fixed_degree=fixed_degree,
        remat=cfg.get("remat", False),
        # production config unrolls the layer stack — the benched path
        # (VERDICT r4 #3); the one long compile is cached persistently below.
        # Unknown/legacy configs default to the fast-compile layer scan.
        scan_layers=cfg.get("scan_layers", True),
    )

    steps_per_epoch = max(len(train_loader), 1)
    sched = warmup_cosine(
        cfg["lr"],
        cfg["warmup_epochs"] * steps_per_epoch,
        cfg["epochs"] * steps_per_epoch,
    )
    tx = make_optimizer(sched, cfg["weight_decay"], cfg["grad_clip"])

    rng = jax.random.PRNGKey(cfg["seed"])
    first = next(iter(mk(val_ds, False)))
    fb = {k: jnp.asarray(v) for k, v in first.asdict().items()}
    params = init_params_host(model, rng, fb)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    if primary:
        print(f"model params: {n_params/1e6:.2f}M  pads: n={n_pad} e={e_pad}")

    state = create_train_state(params, tx)
    ckpt = CheckpointManager(cfg["run_dir"], {**cfg, **stats}, primary=primary)
    if args.checkpoint:
        state, meta = ckpt.restore(args.checkpoint, state)
        print(f"resumed from {args.checkpoint}: epoch {meta.get('epoch')}")
    logger = RunLogger(
        cfg["run_dir"], cfg, use_wandb=cfg.get("use_wandb", False),
        primary=primary,
    )
    latest = {"state": state}
    if primary:
        install_sigterm_checkpoint(lambda: latest["state"], ckpt)

    # ── step function: single-device | sharded mesh (--mesh) ──────────────
    n_micro = 1
    batch_sh = None
    if mesh_spec is not None and mesh_spec["pipe"] > 1:
        # DP x GPipe pipeline over the scanned layer stack
        from jax.sharding import NamedSharding, PartitionSpec as _P

        from ..parallel.data_parallel import stack_microbatches
        from ..parallel.pipeline import (
            make_dp_pipe_mesh,
            make_pipeline_matpes_step,
        )

        if not model.scan_layers:
            raise SystemExit("--mesh pipe= requires scan_layers=True")
        if cfg.get("regress_stress"):
            raise SystemExit("--mesh pipe= does not support stress yet")
        mesh = make_dp_pipe_mesh(mesh_spec["data"], mesh_spec["pipe"])
        n_micro = mesh_spec["data"]
        first_np = {k: np.asarray(v) for k, v in first.asdict().items()}
        stacked_example = stack_microbatches([first_np] * n_micro)
        state_shape = jax.eval_shape(lambda s: s, state)
        step_fn = make_pipeline_matpes_step(
            model, tx, mesh, state_shape,
            {k: jnp.asarray(v) for k, v in stacked_example.items()},
            cfg["w_energy"], cfg["w_force"], ema_decay=cfg["ema_decay"],
            mixed_precision=mixed_precision,
        )
        from ..parallel.pipeline import pipeline_state_shardings

        state = jax.device_put(
            state, pipeline_state_shardings(mesh, state_shape)
        )
        batch_sh = {
            k: NamedSharding(
                mesh, _P(*(["data"] + [None] * (np.ndim(v) - 1)))
            )
            for k, v in stacked_example.items()
        }
        if primary:
            print(
                f"pipeline step: data={mesh_spec['data']} "
                f"pipe={mesh_spec['pipe']} ({n_micro} microbatches/step)"
            )
    elif mesh_spec is not None:
        from ..parallel.data_parallel import stack_microbatches
        from ..parallel.sharding import (
            batch_shardings,
            make_composite_mesh,
            make_composite_matpes_step,
            state_shardings,
        )

        mesh = make_composite_mesh(
            mesh_spec["data"] * mesh_spec["model"],
            model_parallel=mesh_spec["model"],
        )
        n_micro = mesh_spec["data"]
        first_np = {k: np.asarray(v) for k, v in first.asdict().items()}
        stacked_example = stack_microbatches([first_np] * n_micro)
        state_shape = jax.eval_shape(lambda s: s, state)
        step_fn = make_composite_matpes_step(
            model, tx, mesh, state_shape, stacked_example,
            cfg["w_energy"], cfg["w_force"],
            cfg["w_stress"] if cfg.get("regress_stress") else 0.0,
            sp=mesh_spec["sp"], ema_decay=cfg["ema_decay"],
        )
        state = jax.device_put(
            state, state_shardings(mesh, state_shape, model, first_np)
        )
        batch_sh = batch_shardings(mesh, stacked_example, sp=mesh_spec["sp"])
        if primary:
            print(
                f"mesh step: data={mesh_spec['data']} "
                f"model={mesh_spec['model']} sp={mesh_spec['sp']} "
                f"({n_micro} microbatches/step)"
            )
    else:
        step_fn = jax.jit(
            make_matpes_train_step(
                model, tx, cfg["w_energy"], cfg["w_force"],
                cfg["w_stress"] if cfg.get("regress_stress") else 0.0,
                cfg["ema_decay"],
                mixed_precision=mixed_precision,
                inner_ckpt=cfg.get("inner_ckpt"),
            ),
            donate_argnums=(0,),
        )

    best_val = np.inf
    step_count = 0
    nan_batches = 0
    e_mae = f_mae = float("inf")   # last eval (eval_every may skip epochs)
    for epoch in range(cfg["epochs"]):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        losses = []
        micro_buf = []
        n_micro_local = max(n_micro // n_shards, 1)
        for pb in train_loader:
            if mesh_spec is not None:
                micro_buf.append(
                    {k: np.asarray(v) for k, v in pb.asdict().items()}
                )
                if len(micro_buf) < n_micro_local:
                    continue
                from ..parallel.data_parallel import stack_microbatches

                stacked = stack_microbatches(micro_buf)
                micro_buf = []
                if n_shards > 1:
                    # every host contributes its local microbatches to the
                    # globally-sharded [n_micro, ...] arrays
                    batch = {
                        k: jax.make_array_from_process_local_data(
                            batch_sh[k], v
                        )
                        for k, v in stacked.items()
                    }
                else:
                    batch = {
                        k: jax.device_put(v, batch_sh[k])
                        for k, v in stacked.items()
                    }
            else:
                batch = {k: jnp.asarray(v) for k, v in pb.asdict().items()}
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                nan_batches += 1  # update skipped by the trainer's NaN guard
            else:
                losses.append(loss)
            latest["state"] = state
            step_count += 1
            if step_count % cfg["log_every"] == 0:
                logger.log_step(
                    step_count,
                    {
                        "train/loss": loss,
                        "train/energy_l1": float(metrics["energy_l1"]),
                        "train/force_l1": float(metrics["force_l1"]),
                    },
                )
        if (epoch + 1) % cfg.get("eval_every", 1) == 0 \
                or epoch == cfg["epochs"] - 1:
            e_mae, f_mae = evaluate(
                model, state.ema_params, val_loader, stats["energy_std"]
            )
        dt = time.time() - t0
        if primary:
            print(
                f"epoch {epoch}: loss={np.mean(losses):.4f} "
                f"E={e_mae:.1f} meV/atom F={f_mae:.1f} meV/A "
                f"nan_skipped={nan_batches} ({dt:.1f}s)"
            )
            if train_loader.overflow_batches:
                print(
                    f"  WARNING: {train_loader.overflow_batches} batches "
                    f"overflowed the static pads this epoch (dropped "
                    f"{train_loader.overflow_atoms} atoms / "
                    f"{train_loader.overflow_edges} edges) — those graphs' "
                    "physics is wrong; raise n_pad/e_pad"
                )
        logger.log_epoch(
            epoch,
            {
                "train_loss": float(np.mean(losses)) if losses else float("nan"),
                "val_energy_mae_mev": e_mae,
                "val_force_mae_mev": f_mae,
                "nan_batches": nan_batches,
                "overflow_batches": train_loader.overflow_batches,
                "overflow_atoms": train_loader.overflow_atoms,
                "overflow_edges": train_loader.overflow_edges,
                "sec": dt,
            },
        )
        score = e_mae + f_mae
        if score < best_val:
            best_val = score
            ckpt.save_best(state, {"epoch": epoch, "val_score": score})
            # W&B model artifact (reference train_MatPES_GATAWandB.py:477-482)
            logger.log_model_artifact(
                os.path.join(cfg["run_dir"], "ckpt_best"),
                name="best-model",
                description=(
                    f"Best val E+F MAE = {score:.3f} meV at epoch {epoch}"
                ),
            )
        if (epoch + 1) % cfg["ckpt_every_epochs"] == 0:
            ckpt.save_periodic(epoch, state, {"val_score": score})

    logger.update_metrics(best_val_score=best_val, num_params=n_params)
    logger.finalize()


if __name__ == "__main__":
    main()
