"""Benchmark: flagship MatPES GATA-V2 training step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference repo records no throughput numbers anywhere (BASELINE.md) —
``vs_baseline`` is computed against a fixed nominal anchor of 25 graphs/sec
for the reference PyTorch trainer on its actual hardware (single A100,
models/Run_model_MatPESnota100_continue.sh), estimated from the model size
(~10M params @ 6 layers, lmax4/mmax2, ~30-atom cells, autograd forces) — so
the number is comparable across rounds.
"""

import json
import time

import numpy as np

REFERENCE_ANCHOR_GRAPHS_PER_SEC = 25.0

# v5e (v5 lite) peak: 197 TFLOP/s bf16, ~98.5 TFLOP/s f32 per chip
# (public TPU v5e spec) — the MFU denominator
V5E_PEAK_FLOPS_BF16 = 197e12
V5E_PEAK_FLOPS_F32 = 98.5e12

# benchmark shape: realistic MatPES training batch on one v5e chip (16 GB HBM;
# grad-of-grad force training at grid_resolution=18 bounds the batch)
import os

N_GRAPHS = int(os.environ.get("ETQ_BENCH_GRAPHS", 8))
ATOMS_PER_GRAPH = int(os.environ.get("ETQ_BENCH_ATOMS", 30))
N_PAD = int(os.environ.get("ETQ_BENCH_NPAD", 256))
E_PAD = int(os.environ.get("ETQ_BENCH_EPAD", 5120))
STEPS = int(os.environ.get("ETQ_BENCH_STEPS", 10))
# bf16 compute (f32 master params + norms) is the TPU-native design point
BF16 = os.environ.get("ETQ_BENCH_BF16", "1") == "1"
# with the fused S2 kernel the per-block residuals are coefficient-sized, so
# rematerialization is unnecessary at the default shape (measured: 24.2 g/s
# without remat vs 21.3 with); enable it for larger batches.
REMAT = os.environ.get("ETQ_BENCH_REMAT", "0") == "1"
# scan_layers works with the fused kernel (round 2 fix, PERF.md) but costs
# ~25% throughput vs unrolled; the bench unrolls for peak numbers.
# ETQ_BENCH_SCAN=1 measures the fast-compile scan path.
SCAN = os.environ.get("ETQ_BENCH_SCAN", "0") == "1"
# graph-uniform blocking: block-diagonal segment ops, one-hot FLOPs linear in
# batch size (collate(uniform=True) layout)
UNIFORM = os.environ.get("ETQ_BENCH_UNIFORM", "1") == "1"


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from equivarianttransformermpnn4quantumcomputations_tpu.models.matpes import (
        EquiformerV2MatPES,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.train.schedules import (
        warmup_cosine,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.train.trainer import (
        create_train_state,
        make_matpes_train_step,
        make_optimizer,
    )

    model = EquiformerV2MatPES(  # reference MatPES GATA config (GATAV2)
        num_layers=6,
        sphere_channels=128,
        attn_hidden_channels=128,
        num_heads=8,
        attn_alpha_channels=32,
        attn_value_channels=16,
        ffn_hidden_channels=512,
        lmax=4,
        mmax=2,
        grid_resolution=18,
        edge_channels=128,
        num_rbf=600,
        max_num_elements=100,
        gata=True,
        alpha_drop=0.0,
        drop_path_rate=0.0,
        scan_layers=SCAN,
        compute_dtype="bfloat16" if BF16 else "float32",
        remat=REMAT,
        uniform_blocks=UNIFORM,
    )

    rng = np.random.default_rng(0)
    raw = _synthetic_batch(
        rng, N_GRAPHS, ATOMS_PER_GRAPH, N_PAD, E_PAD, max_neighbors=20,
        uniform=UNIFORM,
    )
    batch = {k: jnp.asarray(v) for k, v in raw.items()}

    params = model.init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(warmup_cosine(2e-4, 100, 10000), weight_decay=1e-3)
    state = create_train_state(params, tx)
    step = jax.jit(
        make_matpes_train_step(model, tx, mixed_precision=BF16),
        donate_argnums=(0,),
    )

    # hardware-grounded FLOPs/step from the optimized HLO (XLA cost model) —
    # the MFU numerator; denominator = v5e peak (see constants above)
    flops_per_step = None
    try:
        lowered = step.lower(state, batch, jax.random.PRNGKey(1))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    key = jax.random.PRNGKey(1)
    # compile + warmup
    state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    graphs_per_sec = N_GRAPHS * STEPS / dt
    out = {
        "metric": "matpes_gata_train_graphs_per_sec_per_chip",
        "value": round(graphs_per_sec, 2),
        "unit": "graphs/sec/chip",
        "vs_baseline": round(
            graphs_per_sec / REFERENCE_ANCHOR_GRAPHS_PER_SEC, 3
        ),
    }
    if flops_per_step:
        peak = V5E_PEAK_FLOPS_BF16 if BF16 else V5E_PEAK_FLOPS_F32
        achieved = flops_per_step * STEPS / dt
        out["flops_per_step"] = round(flops_per_step / 1e9, 2)  # GFLOP
        out["mfu"] = round(achieved / peak, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
