"""Performance breakdown on the real chip: times forward / forces / full step
at the bench shape, for f32 and bf16.  Writes PERF_BREAKDOWN.md.

Run:  python scripts/perf_breakdown.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from equivarianttransformermpnn4quantumcomputations_tpu.models.matpes import (
        EquiformerV2MatPES,
        matpes_energy_forces_stress,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.train.schedules import (
        warmup_cosine,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.train.trainer import (
        create_train_state,
        make_matpes_train_step,
        make_optimizer,
    )

    G, A, NP, EP = 8, 30, 256, 5120
    rng = np.random.default_rng(0)
    raw = _synthetic_batch(rng, G, A, NP, EP, max_neighbors=20)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}

    results = {}
    for dtype in ["float32", "bfloat16"]:
        model = EquiformerV2MatPES(
            num_layers=6, sphere_channels=128, attn_hidden_channels=128,
            num_heads=8, attn_alpha_channels=32, attn_value_channels=16,
            ffn_hidden_channels=512, lmax=4, mmax=2, grid_resolution=18,
            edge_channels=128, num_rbf=600, max_num_elements=100,
            gata=True, alpha_drop=0.0, drop_path_rate=0.0,
            scan_layers=False, compute_dtype=dtype,
        )
        params = model.init(jax.random.PRNGKey(0), batch)
        mp = dtype == "bfloat16"
        if mp:
            from equivarianttransformermpnn4quantumcomputations_tpu.train.trainer import (
                cast_params,
            )

            apply_params = cast_params(params, jnp.bfloat16)
        else:
            apply_params = params

        fwd = jax.jit(lambda p, b: model.apply(p, b)["energy_total"])
        t_fwd = timed(fwd, apply_params, batch)

        ff = jax.jit(
            lambda p, b: matpes_energy_forces_stress(model, p, b)["forces"]
        )
        t_force = timed(ff, apply_params, batch)

        tx = make_optimizer(warmup_cosine(2e-4, 100, 10000), weight_decay=1e-3)
        state = create_train_state(params, tx)
        step = jax.jit(
            make_matpes_train_step(model, tx, mixed_precision=mp),
        )
        state, m = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for i in range(5):
            state, m = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i))
        jax.block_until_ready(m["loss"])
        t_step = (time.perf_counter() - t0) / 5

        results[dtype] = {
            "forward_s": t_fwd,
            "energy_forces_s": t_force,
            "train_step_s": t_step,
            "graphs_per_sec": G / t_step,
        }
        print(dtype, results[dtype], flush=True)

    with open("PERF_BREAKDOWN.md", "w") as f:
        f.write("# PERF — MatPES GATA flagship, 8 graphs x 30 atoms, v5e-1\n\n")
        f.write("| dtype | forward | energy+forces | train step | graphs/s |\n")
        f.write("|---|---|---|---|---|\n")
        for d, r in results.items():
            f.write(
                f"| {d} | {r['forward_s']*1e3:.1f} ms | "
                f"{r['energy_forces_s']*1e3:.1f} ms | "
                f"{r['train_step_s']*1e3:.1f} ms | "
                f"{r['graphs_per_sec']:.1f} |\n"
            )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
