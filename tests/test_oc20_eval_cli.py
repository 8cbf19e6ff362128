"""End-to-end OC20 CLI test: train on synthetic crystals, then evaluate the
saved checkpoint through the standalone eval CLI (train/test_oc20.py) — the
counterpart of the reference's checkpoint-eval protocol (test_qm9v3.py:33-92;
the reference's own test_oc20*.py scripts are miscopied QM9 evaluators)."""

import json
import os

import pytest

from equivarianttransformermpnn4quantumcomputations_tpu.train import (
    test_oc20 as eval_cli,
)
from equivarianttransformermpnn4quantumcomputations_tpu.train import (
    train_oc20,
)


@pytest.mark.slow
def test_oc20_train_then_eval_cli(tmp_path, capsys):
    run_dir = str(tmp_path / "run")
    train_oc20.main(
        ["--config", "synthetic", "--epochs", "1", "--run-dir", run_dir]
    )
    assert os.path.isdir(os.path.join(run_dir, "ckpt_best"))

    eval_cli.main(
        ["--checkpoint", os.path.join(run_dir, "ckpt_best"), "--split", "val"]
    )
    out = capsys.readouterr().out
    assert "energy MAE" in out and "force  MAE" in out

    with open(os.path.join(run_dir, "eval_oc20_val.json")) as f:
        res = json.load(f)
    assert res["n_frames"] == 16
    assert res["energy_mae_mev"] > 0
    assert res["force_mae_mev_per_a"] > 0
