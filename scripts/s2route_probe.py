"""Bisect the round-3 scan-path regression: time the flagship step with the
FFN S2-act routed to (a) the fused kernel everywhere (old routing) vs
(b) XLA below ETQ_S2_FUSED_MIN_ROWS rows (new routing).  Run on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(min_rows: str, steps: int = 3):
    os.environ["ETQ_S2_FUSED_MIN_ROWS"] = min_rows
    # force re-import of the routing module so the env var takes effect
    for m in list(sys.modules):
        if m.startswith("equivarianttransformermpnn4quantumcomputations_tpu"):
            del sys.modules[m]
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
        edge_channels=128, num_rbf=600, max_num_elements=100, gata=True,
        alpha_drop=0.0, drop_path_rate=0.0, scan_layers=True,
        compute_dtype="bfloat16", uniform_blocks=True,
    )
    rng = np.random.default_rng(0)
    raw = _synthetic_batch(rng, 8, 30, 256, 5120, max_neighbors=20, uniform=True)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    t0 = time.perf_counter()
    params = init_params_host(model, jax.random.PRNGKey(0), batch)
    print(f"min_rows={min_rows}: init {time.perf_counter()-t0:.1f}s "
          f"param device: {jax.tree_util.tree_leaves(params)[0].devices()}",
          flush=True)
    tx = make_optimizer(warmup_cosine(2e-4, 100, 10000), weight_decay=1e-3)
    state = create_train_state(params, tx)
    step = jax.jit(make_matpes_train_step(model, tx, mixed_precision=True))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    print(f"min_rows={min_rows}: compile+step1 {time.perf_counter()-t0:.1f}s",
          flush=True)
    for i in range(steps):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0
        try:
            cs = step._cache_size()
        except Exception:
            cs = "?"
        print(f"min_rows={min_rows}: step{i+1} {dt*1000:.1f} ms "
              f"(jit cache size {cs})", flush=True)


if __name__ == "__main__":
    for mr in sys.argv[1:] or ["0", "512"]:
        run(mr)
