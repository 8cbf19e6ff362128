"""MatPES training configs (mirrors configs/MatPES/*.py dicts, e.g.
config_cosinelearningMoreGATA.py — GATA-V2 model + cosine schedule;
literature anchors per the reference: TensorNet/M3GNet-class models reach
energy ~3-5 meV/atom, force ~50-80 meV/A, stress ~0.3-0.6 GPa)."""

config = {
    # data
    "data_path": "datasets/MatPES/MatPES-PBE-2025.1.json.gz",
    "split_path": "datasets/MatPES/MatPES-PBE-split.json.gz",
    "cache_dir": "datasets/MatPES/cache",
    # throughput-optimal v5e batch (bench r4 sweep: 16 > 8/24/32 with the
    # fixed-degree layout and no inner checkpoint; reference used 32 on A100)
    "batch_size": 16,
    "max_train": None,
    "max_val": None,
    "max_test": None,
    # model (reference equiformerv2_MatPES_GATAV2.py defaults)
    "gata": True,
    "num_layers": 6,
    "sphere_channels": 128,
    "attn_hidden_channels": 128,
    "num_heads": 8,
    "attn_alpha_channels": 32,
    "attn_value_channels": 16,
    "ffn_hidden_channels": 512,
    "lmax": 4,
    "mmax": 2,
    "grid_resolution": 18,
    "edge_channels": 128,
    "num_rbf": 600,
    "max_num_elements": 100,
    "cutoff": 6.0,
    "max_neighbors": 20,
    "alpha_drop": 0.05,
    "drop_path_rate": 0.05,
    "avg_degree": 12.0,
    "normalize_attn_output": True,
    "use_phi_every_layer": False,
    # loss weights (reference train_MatPES_GATAWandB.py:79-81)
    "w_energy": 1.0,
    "w_force": 1.0,
    "w_stress": 0.0,
    "regress_stress": False,
    # optimization
    "lr": 2e-4,
    "weight_decay": 1e-3,
    "epochs": 100,
    "warmup_epochs": 1,
    "grad_clip": 1.0,
    "ema_decay": 0.999,
    # run
    "run_dir": "runs/matpes_gata",
    "seed": 0,
    "log_every": 50,
    "ckpt_every_epochs": 1,
    "use_wandb": False,
    # ── production step config == the benched config (VERDICT r4 #3) ──
    # bench.py times exactly this step shape: unrolled layers (the ~19%-
    # faster path; one 5-30 min compile amortized by the persistent compile
    # cache train_matpes.py enables), no per-block remat, no inner energy
    # checkpoint (b16 fits v5e HBM without them), bf16 compute.
    "scan_layers": False,
    "remat": False,
    "inner_ckpt": False,
    "mixed_precision": True,
}

config_debug = {
    **config,
    "max_train": 256,
    "max_val": 64,
    "max_test": 64,
    "epochs": 2,
    "num_layers": 2,
    "batch_size": 8,
    "run_dir": "runs/matpes_debug",
    # debug/CPU: fast compile + f32 numerics beat peak throughput
    "scan_layers": True,
    "mixed_precision": False,
}

# ablation: no attention-output normalization
# (reference equiformerv2_MatPES_GATAV2_no_normalize_attn_output.py)
config_no_attn_norm = {**config, "normalize_attn_output": False}

# phi refined at every layer
# (reference equiformerv2_MatPES_GATAV2_phi_at_every_iteration_like_gata.py)
config_phi_every_layer = {**config, "use_phi_every_layer": True}

# baseline (non-GATA) EquiformerV2 on MatPES
# (reference equiformerv2_MatPES.py / train_MatPES_originalEFV2_WandB.py)
config_baseline_efv2 = {**config, "gata": False, "regress_stress": True,
                        "w_stress": 0.1}

# synthetic-LJ train-to-convergence (parity-numerics evidence, TPU):
# the model must drive energy/force MAE on an analytic LJ surface well below
# the literature target band (E ~3-5 meV/atom) — see PARITY_NUMERICS.md
config_synthetic_convergence = {
    **config,
    "synthetic": True,
    "max_train": 512,
    "max_val": 64,
    "cutoff": 5.0,
    "num_layers": 4,
    "num_rbf": 128,
    "batch_size": 32,
    "epochs": 200,
    "warmup_epochs": 10,
    "eval_every": 5,
    "ckpt_every_epochs": 20,
    # 1e-3 diverged at epoch ~9 on this task (finite-but-huge loss slips
    # past the non-finite guard); 3e-4 trains stably
    "lr": 3e-4,
    "alpha_drop": 0.0,
    "drop_path_rate": 0.0,
    "run_dir": "runs/matpes_synth_convergence",
    # convergence study keeps the fast-compile scan + f32 (numerics over
    # peak; the r4 run's settings)
    "scan_layers": True,
    "mixed_precision": False,
}


# fixture-scale real-format training (VERDICT r4 #5): MatPES-format entries
# with consistent LJ energy/forces (scripts/make_fixture_train_data.py)
config_fixture = {
    **config,
    "data_path": "tests/fixtures/train/matpes_train.json.gz",
    "split_path": "tests/fixtures/train/matpes_split_train.json.gz",
    "cache_dir": None,
    "batch_size": 8,
    "num_layers": 2,
    "sphere_channels": 32,
    "attn_hidden_channels": 32,
    "num_heads": 4,
    "attn_alpha_channels": 8,
    "attn_value_channels": 8,
    "ffn_hidden_channels": 64,
    "lmax": 2,
    "mmax": 1,
    "grid_resolution": None,
    "edge_channels": 32,
    "num_rbf": 64,
    "cutoff": 5.0,
    "max_neighbors": 12,
    "alpha_drop": 0.0,
    "drop_path_rate": 0.0,
    "epochs": 80,
    "warmup_epochs": 4,
    "eval_every": 5,
    "lr": 1e-3,
    "weight_decay": 0.0,
    "run_dir": "runs/matpes_fixture",
    "scan_layers": True,
    "mixed_precision": False,
}
