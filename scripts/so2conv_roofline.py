"""SO(2)-conv roofline measurement (BASELINE.md north-star; VERDICT r4 #2).

Times every SO2Conv site of the flagship MatPES-GATA step at its exact
shapes — forward and the train-relevant grad-of-grad chain — against the
matmul roofline for the same GEMM dims, measured two ways:

* ideal GEMM: a plain ``x @ w`` chain with the same (M, K, N) per site,
  timed identically (what the MXU can do for this work when nothing else
  is in the way);
* paper roofline: semantic GEMM FLOPs / 197 TFLOP/s (bf16 v5e peak).

All timings are device self-times from the xplane trace
(utils/profiling.py) — wall clamps through the axon tunnel are not
trustworthy below ~0.5 ms (PERF.md measurement caveat).

Run (TPU): python scripts/so2conv_roofline.py [--reps 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_BF16 = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--e", type=int, default=10240)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from equivarianttransformermpnn4quantumcomputations_tpu.nn.so3_layers import (
        SO2Conv,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.ops.irreps import (
        layout as get_layout,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.utils.profiling import (
        device_step_time,
    )

    E = args.e
    lay = get_layout(4, 2)           # flagship lmax 4 / mmax 2, K_red = 19
    K_red = int(lay.m_size.sum())
    rng = jax.random.PRNGKey(0)

    # flagship sites (bench config: C=128, heads 8, alpha 32, value 16;
    # GATA: conv1 is m0-only with extra_m0 = 256 + 9*128, conv2 full)
    sites = {
        "conv1_m0 (GATA)": dict(
            m0_only=True, in_channels=256, out_channels=128,
            extra_m0=8 * 32 + 9 * 128, rad_channels=(600, 128, 128),
            x_shape=(E, 5, 256),
        ),
        "conv2": dict(
            m0_only=False, in_channels=128, out_channels=128,
            extra_m0=0, rad_channels=None, x_shape=(E, K_red, 128),
        ),
        "conv1_full (qm9/oc20)": dict(
            m0_only=False, in_channels=256, out_channels=128,
            extra_m0=8 * 32 + 128, rad_channels=(600, 128, 128),
            x_shape=(E, K_red, 256),
        ),
    }

    def gemm_dims(cfg):
        """(M, K, N) list of the site's semantic GEMMs."""
        Cin, Cout = cfg["in_channels"], cfg["out_channels"]
        L0 = 5
        dims = [(E, L0 * Cin, cfg["extra_m0"] + L0 * Cout)]
        if not cfg["m0_only"]:
            for m, Lm in ((1, 4), (2, 3)):
                dims.append((E, 2 * Lm * Cin, 2 * Lm * Cout))
        if cfg["rad_channels"] is not None:
            chs = list(cfg["rad_channels"]) + [
                (L0 if cfg["m0_only"] else K_red) * Cin
            ]
            for i in range(1, len(chs)):
                dims.append((E, chs[i - 1], chs[i]))
        return dims

    results = {}
    for name, cfg in sites.items():
        x = jax.random.normal(rng, cfg["x_shape"], jnp.bfloat16)
        scal = jax.random.normal(rng, (E, 600), jnp.bfloat16)
        conv = SO2Conv(
            layout=lay, in_channels=cfg["in_channels"],
            out_channels=cfg["out_channels"], extra_m0=cfg["extra_m0"],
            rad_channels=cfg["rad_channels"], m0_only=cfg["m0_only"],
        )
        params = conv.init(
            rng, x, scal if cfg["rad_channels"] else None
        )

        def fwd_loss(p, x):
            out, extra = conv.apply(
                p, x, scal if cfg["rad_channels"] else None
            )
            tot = 0.0
            if out is not None:
                tot = tot + jnp.sum(out.astype(jnp.float32) ** 2)
            if extra is not None:
                tot = tot + jnp.sum(extra.astype(jnp.float32) ** 2)
            return tot

        # train-relevant chain: value-and-grad wrt params AND x, plus
        # grad-of-grad wrt x (the force pass sees each conv at 2nd order)
        def train_chain(p, x):
            gx = jax.grad(fwd_loss, argnums=1)(p, x)
            inner = lambda xx: jnp.sum(
                jax.grad(fwd_loss, argnums=1)(p, xx).astype(jnp.float32)
                ** 2
            )
            l2, gp = jax.value_and_grad(
                lambda pp: fwd_loss(pp, x) + inner(x)
            )(p)
            return l2, gx, gp

        fwd = jax.jit(fwd_loss)
        chain = jax.jit(train_chain)
        fwd(params, x).block_until_ready()
        jax.block_until_ready(chain(params, x))

        def run_fwd():
            for _ in range(args.reps):
                r = fwd(params, x)
            r.block_until_ready()

        def run_chain():
            for _ in range(args.reps):
                r = chain(params, x)
            jax.block_until_ready(r)

        t_fwd = device_step_time(lambda i: run_fwd(), n_steps=1) / args.reps
        t_chain = (
            device_step_time(lambda i: run_chain(), n_steps=1) / args.reps
        )

        # ideal GEMM chain with identical dims (bf16)
        dims = gemm_dims(cfg)
        mats = [
            (
                jax.random.normal(rng, (m, k), jnp.bfloat16),
                jax.random.normal(rng, (k, n), jnp.bfloat16),
            )
            for (m, k, n) in dims
        ]

        def ideal(ms):
            # takes the matrices as ARGUMENTS — a closed-over constant
            # expression would be constant-folded to a scalar at compile
            # time and profile zero device ops
            return sum(
                jnp.sum((a @ b).astype(jnp.float32) ** 2) for a, b in ms
            )

        ideal_j = jax.jit(ideal)
        ideal_j(mats).block_until_ready()

        def run_ideal():
            for _ in range(args.reps):
                r = ideal_j(mats)
            r.block_until_ready()

        t_ideal = (
            device_step_time(lambda i: run_ideal(), n_steps=1) / args.reps
        )

        flops_fwd = sum(2 * m * k * n for (m, k, n) in dims)
        sol_fwd = flops_fwd / V5E_PEAK_BF16
        # chain = fwd + bwd(2x fwd flops) [x2 orders approx]: report vs its
        # own semantic count (fwd graph + dx + (fwd+inner) grad ~ 6x fwd)
        results[name] = dict(
            fwd_ms=t_fwd * 1e3, chain_ms=t_chain * 1e3,
            ideal_ms=t_ideal * 1e3, sol_fwd_ms=sol_fwd * 1e3,
            fwd_vs_sol=sol_fwd / t_fwd,
            fwd_vs_ideal=t_ideal / t_fwd,
            gflops_fwd=flops_fwd / 1e9,
        )
        print(
            f"{name}: fwd {t_fwd*1e3:.3f} ms | ideal-GEMM {t_ideal*1e3:.3f}"
            f" ms | paper-SOL {sol_fwd*1e3:.3f} ms | fwd at "
            f"{100*sol_fwd/t_fwd:.0f}% of paper roofline, "
            f"{100*t_ideal/t_fwd:.0f}% of ideal-GEMM | chain "
            f"{t_chain*1e3:.3f} ms",
            flush=True,
        )

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
