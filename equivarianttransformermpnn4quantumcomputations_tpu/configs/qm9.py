"""QM9 training configs (mirrors configs/QM9/config_equiformerV2.py dicts:
a module-level ``config`` plus debug/conservative/aggressive variants,
reference configs/QM9/config_equiformerV2.py:227-253)."""

config = {
    # data
    "db_path": "datasets/QM9/qm9.db",
    "stats_json": "datasets/QM9/qm9_full_stats.json",
    "batch_size": 64,
    "val_split": 0.1,
    "test_split": 0.1,
    "max_samples": None,
    "target_indices": None,          # all 12 paper-order targets
    # model (reference equiformerv2_qm9.py defaults)
    "num_layers": 8,
    "sphere_channels": 128,
    "attn_hidden_channels": 128,
    "num_heads": 8,
    "attn_alpha_channels": 32,
    "attn_value_channels": 16,
    "ffn_hidden_channels": 512,
    "lmax": 4,
    "mmax": 2,
    "edge_channels": 128,
    "num_rbf": 600,
    "max_num_elements": 10,
    "cutoff": 5.0,
    "max_neighbors": 50,
    "alpha_drop": 0.1,
    "drop_path_rate": 0.05,
    "proj_drop": 0.0,
    "avg_degree": 6.0,
    # optimization (reference train_qm9v3.py:193-226)
    "lr": 5e-4,
    "weight_decay": 5e-3,
    "epochs": 300,
    "warmup_epochs": 5,
    "loss": "l1",
    "grad_clip": 1.0,
    "ema_decay": 0.999,
    # run
    "run_dir": "runs/qm9",
    "seed": 0,
    "log_every": 50,
    "ckpt_every_epochs": 10,
}

# fast integration config (reference config_debug :227-234)
config_debug = {
    **config,
    "max_samples": 1000,
    "epochs": 5,
    "num_layers": 4,
    "batch_size": 16,
    "run_dir": "runs/qm9_debug",
}

config_conservative = {**config, "lr": 1e-4, "weight_decay": 1e-2}
config_aggressive = {**config, "lr": 1.5e-3, "weight_decay": 1e-3}


# fixture-scale real-format training (VERDICT r4 #5): a genuine ASE-sqlite
# db with learnable geometry-derived labels
# (scripts/make_fixture_train_data.py); small model, CPU/TPU-fast
config_fixture = {
    **config,
    "db_path": "tests/fixtures/train/qm9_train.db",
    "stats_json": "tests/fixtures/train/qm9_train_stats.json",
    "batch_size": 8,
    "val_split": 0.15,
    "test_split": 0.15,
    "num_layers": 2,
    "sphere_channels": 32,
    "attn_hidden_channels": 32,
    "num_heads": 4,
    "attn_alpha_channels": 8,
    "attn_value_channels": 8,
    "ffn_hidden_channels": 64,
    "lmax": 2,
    "mmax": 1,
    "edge_channels": 32,
    "num_rbf": 64,
    "alpha_drop": 0.0,
    "drop_path_rate": 0.0,
    "epochs": 60,
    "warmup_epochs": 3,
    "lr": 1e-3,
    "weight_decay": 0.0,
    "run_dir": "runs/qm9_fixture",
}
