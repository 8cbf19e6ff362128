"""Inventory of data-movement instructions in the compiled flagship step.

Compiles the exact bench step (b16, unrolled, fixed-degree, bf16) and
greps the optimized HLO for copy / transpose / convert / bitcast-convert
instructions, aggregating count x bytes by shape — the ground truth for
the ~19% movement bucket (PERF.md round-4 post-landing profile; VERDICT
r4 #1 lever (a)).

Run on TPU: python scripts/hlo_copy_inventory.py [--graphs 16]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def shape_bytes(shape_str: str) -> int:
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    nbytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
              "f16": 2, "u8": 1, "s64": 8, "f64": 8}.get(dt, 4)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * nbytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=16)
    ap.add_argument("--atoms", type=int, default=30)
    ap.add_argument("--npad", type=int, default=512)
    ap.add_argument("--epad", type=int, default=10240)
    ap.add_argument("--top", type=int, default=30)
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
        make_matpes_train_step,
        make_optimizer,
    )

    model = EquiformerV2MatPES(
        num_layers=6, sphere_channels=128, attn_hidden_channels=128,
        num_heads=8, attn_alpha_channels=32, attn_value_channels=16,
        ffn_hidden_channels=512, lmax=4, mmax=2, grid_resolution=18,
        edge_channels=128, num_rbf=600, max_num_elements=100,
        gata=True, alpha_drop=0.0, drop_path_rate=0.0,
        scan_layers=False, compute_dtype="bfloat16",
        uniform_blocks=True, fixed_degree=True, remat=False,
    )
    rng = np.random.default_rng(0)
    raw = _synthetic_batch(
        rng, args.graphs, args.atoms, args.npad, args.epad,
        max_neighbors=20, uniform=True, fixed_degree=True,
    )
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    # abstract state (no init needed for lowering)
    tx = make_optimizer(warmup_cosine(2e-4, 100, 10000), weight_decay=1e-3)

    def build():
        params = model.init(jax.random.PRNGKey(0), batch)
        return create_train_state(params, tx)

    state_shape = jax.eval_shape(build)
    step = make_matpes_train_step(model, tx, mixed_precision=True)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    batch_shape = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch
    )
    print("lowering...", flush=True)
    lowered = jax.jit(step).lower(state_shape, batch_shape, key)
    print("compiling...", flush=True)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt)/1e6:.1f} MB", flush=True)

    pat = re.compile(
        r"^\s*(?:ROOT\s+)?%?\S+\s*=\s*(\S+?)\s+(copy|transpose|convert|"
        r"bitcast-convert)\(",
        re.M,
    )
    agg = collections.Counter()
    bytes_agg = collections.Counter()
    for m in pat.finditer(txt):
        shape, op = m.groups()
        key2 = f"{op} {shape}"
        agg[key2] += 1
        bytes_agg[key2] += shape_bytes(shape)
    total_bytes = sum(bytes_agg.values())
    print(f"\n== movement instructions (static count, output bytes) — "
          f"total {total_bytes/1e6:.0f} MB ==")
    for key2, b in bytes_agg.most_common(args.top):
        print(f"{b/1e6:10.1f} MB  x{agg[key2]:<5d} {key2}")

    # fusion-wrapped copies don't appear as top-level 'copy' — count
    # fusion computations whose root is a copy/transpose too
    n_fus = len(re.findall(r"fused_computation", txt))
    print(f"\n(fusion computations: {n_fus}; wrapped transposes/copies "
          "inside fusions are not in the table above)")


if __name__ == "__main__":
    main()
