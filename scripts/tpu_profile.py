"""Profile the flagship MatPES-GATA train step on the real chip and print the
top HLO ops by self-time (parsed from the jax.profiler xplane via
tensorboard_plugin_profile).

Run (TPU):  python scripts/tpu_profile.py [--scan] [--steps N]
Writes the raw trace under runs/profile/ and a parsed op table to stdout.
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", action="store_true", help="scan_layers=True")
    ap.add_argument("--fixed-degree", action="store_true",
                    help="fixed-degree edge layout (collate(fixed_degree))")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--graphs", type=int, default=8)
    ap.add_argument("--atoms", type=int, default=30)
    ap.add_argument("--npad", type=int, default=256)
    ap.add_argument("--epad", type=int, default=5120)
    ap.add_argument("--logdir", default="runs/profile")
    args = ap.parse_args()

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
        init_params_host,
        make_matpes_train_step,
        make_optimizer,
    )

    model = EquiformerV2MatPES(
        num_layers=6, sphere_channels=128, attn_hidden_channels=128,
        num_heads=8, attn_alpha_channels=32, attn_value_channels=16,
        ffn_hidden_channels=512, lmax=4, mmax=2, grid_resolution=18,
        edge_channels=128, num_rbf=600, max_num_elements=100,
        gata=True, alpha_drop=0.0, drop_path_rate=0.0,
        scan_layers=args.scan, compute_dtype="bfloat16",
        uniform_blocks=True, fixed_degree=args.fixed_degree,
        remat=False,   # match bench.py's production step (remat off)
    )
    rng = np.random.default_rng(0)
    raw = _synthetic_batch(
        rng, args.graphs, args.atoms, args.npad, args.epad,
        max_neighbors=20, uniform=True, fixed_degree=args.fixed_degree,
    )
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    params = init_params_host(model, jax.random.PRNGKey(0), batch)
    tx = make_optimizer(warmup_cosine(2e-4, 100, 10000), weight_decay=1e-3)
    state = create_train_state(params, tx)
    step = jax.jit(
        make_matpes_train_step(model, tx, mixed_precision=True),
        donate_argnums=(0,),
    )

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    print(f"compile+step1: {time.perf_counter() - t0:.1f}s", flush=True)

    # timed (unprofiled) reference
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    print(f"step: {dt*1e3:.1f} ms -> {args.graphs/dt:.1f} graphs/s", flush=True)

    logdir = args.logdir
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    for i in range(3):
        state, metrics = step(state, batch, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()

    xplanes = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not xplanes:
        print("no xplane found under", logdir)
        return
    xplane = xplanes[-1]
    print("parsing", xplane, flush=True)
    parse_xplane(xplane)


def parse_xplane(xplane_path, top=40):
    """Aggregate per-HLO-op self time on the device plane (print table)."""
    from equivarianttransformermpnn4quantumcomputations_tpu.utils.profiling import (
        xplane_self_times,
    )

    tot, totals, counts = xplane_self_times(xplane_path)
    print(f"\n== device XLA Ops — total SELF time {tot*1e3:.1f} ms ==")
    for name, t in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(
            f"{t*1e3:9.2f} ms  {100*t/tot:5.1f}%  x{counts[name]:<5d}"
            f" {name}"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1].endswith(".xplane.pb"):
        parse_xplane(sys.argv[1])
    else:
        main()
