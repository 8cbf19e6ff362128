"""Op-level microbenchmarks at flagship shapes on the current device.

Times each hot op in isolation (jitted, block_until_ready) so kernel work
targets the real bottleneck.  Run: python scripts/op_microbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(fn, *args, reps=20):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from equivarianttransformermpnn4quantumcomputations_tpu.ops import rotation as R
    from equivarianttransformermpnn4quantumcomputations_tpu.ops.irreps import layout
    from equivarianttransformermpnn4quantumcomputations_tpu.ops.s2grid import s2grid
    from equivarianttransformermpnn4quantumcomputations_tpu.ops.segment import (
        segment_softmax,
        segment_sum,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.nn.so3_layers import SO2Conv

    E, N, C, H = 10240, 512, 128, 128
    LMAX, MMAX = 4, 2
    lay = layout(LMAX, MMAX)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if os.environ.get("BF16") == "1" else jnp.float32

    x_nodes = jnp.asarray(rng.normal(size=(N, 25, 2 * C)), dtype=dt)
    edge_src = jnp.asarray(rng.integers(0, N, size=E), dtype=jnp.int32)
    edge_dst = jnp.asarray(np.sort(rng.integers(0, N, size=E)), dtype=jnp.int32)
    emask = jnp.ones(E, dtype=bool)
    vecs = jnp.asarray(rng.normal(size=(E, 3)), dtype=jnp.float32)
    wig = R.compute_wigner(LMAX, vecs)
    x_edges = jnp.asarray(rng.normal(size=(E, 25, 2 * C)), dtype=dt)
    x_red = jnp.asarray(rng.normal(size=(E, lay.num_coefficients, 2 * C)), dtype=dt)
    x_hid = jnp.asarray(rng.normal(size=(E, lay.num_coefficients, H)), dtype=dt)
    edge_feats = jnp.asarray(rng.normal(size=(E, 600)), dtype=jnp.float32)

    results = {}
    results["gather_nodes_to_edges"] = t(jax.jit(lambda x, i: x[i]), x_nodes, edge_src)
    results["compute_wigner"] = t(
        jax.jit(lambda v: R.compute_wigner(LMAX, v)), vecs
    )
    results["rotate_to_edge"] = t(
        jax.jit(lambda w, x: R.rotate_to_edge(w, x, lay)), wig, x_edges
    )
    results["rotate_from_edge"] = t(
        jax.jit(lambda w, x: R.rotate_from_edge(w, x, lay)), wig, x_hid
    )

    conv = SO2Conv(
        layout=lay, in_channels=2 * C, out_channels=H,
        extra_m0=8 * 32 + 9 * H, rad_channels=(600, 128, 128),
    )
    p = conv.init(jax.random.PRNGKey(0), x_red, edge_feats)
    results["so2_conv_1(rad)"] = t(
        jax.jit(lambda p, x, e: conv.apply(p, x, e)), p, x_red, edge_feats
    )
    conv2 = SO2Conv(layout=lay, in_channels=H, out_channels=H)
    p2 = conv2.init(jax.random.PRNGKey(0), x_hid)
    results["so2_conv_2"] = t(jax.jit(lambda p, x: conv2.apply(p, x)), p2, x_hid)

    g = s2grid(LMAX, MMAX, 18)
    results["s2_act_xla(grid18)"] = t(
        jax.jit(lambda x: g.from_grid(jax.nn.silu(g.to_grid(x)))), x_hid
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.ops.pallas.s2act import (
        s2act_fused,
    )
    results["s2_act_fused(grid18)"] = t(
        jax.jit(lambda x: s2act_fused(x, g)), x_hid
    )
    logits = jnp.asarray(rng.normal(size=(E, 8)), dtype=jnp.float32)
    results["segment_softmax"] = t(
        jax.jit(lambda l: segment_softmax(l, edge_dst, N, emask)), logits
    )
    results["segment_softmax_sorted"] = t(
        jax.jit(
            lambda l: segment_softmax(l, edge_dst, N, emask, sorted_ids=True)
        ),
        logits,
    )
    results["segment_sum_scatter"] = t(
        jax.jit(
            lambda v: segment_sum(v, edge_dst, N, emask, method="scatter")
        ),
        jnp.asarray(rng.normal(size=(E, 25, H)), dtype=dt),
    )
    vals = jnp.asarray(rng.normal(size=(E, 25, H)), dtype=dt)
    results["segment_sum_messages"] = t(
        jax.jit(lambda v: segment_sum(v, edge_dst, N, emask)), vals
    )

    for k, v in results.items():
        print(f"{k:28s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
