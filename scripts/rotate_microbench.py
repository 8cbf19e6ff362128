"""Microbenchmark: 3 formulations of one factored-Wigner stage on TPU.

    y[e,i,c] = sum_k M[i,k] * (c[e,k] * x[e,k,c])      M = [Kout, 2K] const

(a) K-major einsum  ('ik,kec->iec' on [K,E,C])
(b) K-minor GEMM    ([E,C,2K] @ [2K,Kout] — reshape-free MXU dot)
(c) E-major einsum  ('ik,ekc->eic' on [E,K,C], the original)

Run: python scripts/rotate_microbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    E, K, C = 5120, 25, 256
    KOUT = 25
    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.normal(size=(KOUT, 2 * K)), jnp.bfloat16)
    cs = jnp.asarray(rng.normal(size=(E, K)), jnp.bfloat16)
    ss = jnp.asarray(rng.normal(size=(E, K)), jnp.bfloat16)

    x_ekc = jnp.asarray(rng.normal(size=(E, K, C)), jnp.bfloat16)
    x_kec = jnp.transpose(x_ekc, (1, 0, 2))
    x_eck = jnp.transpose(x_ekc, (0, 2, 1))

    @jax.jit
    def f_kmajor(x, c, s):
        z = jnp.concatenate(
            [c.T[..., None] * x, s.T[..., None] * x], axis=0
        )  # [2K, E, C]
        return jnp.einsum("ik,kec->iec", M, z)

    @jax.jit
    def f_kminor(x, c, s):
        z = jnp.concatenate(
            [c[:, None, :] * x, s[:, None, :] * x], axis=2
        )  # [E, C, 2K]
        return jax.lax.dot_general(
            z.reshape(E * C, 2 * K), M.T,
            (((1,), (0,)), ((), ())),
        ).reshape(E, C, KOUT)

    @jax.jit
    def f_emajor(x, c, s):
        z = jnp.concatenate(
            [c[:, :, None] * x, s[:, :, None] * x], axis=1
        )  # [E, 2K, C]
        return jnp.einsum("ik,ekc->eic", M, z)

    @jax.jit
    def f_kminor_2stage(x, c, s):
        # two chained stages (like a full to_edge rotate), staying K-minor
        z = jnp.concatenate([c[:, None, :] * x, s[:, None, :] * x], axis=2)
        y = jax.lax.dot_general(
            z.reshape(E * C, 2 * K), M.T, (((1,), (0,)), ((), ()))
        ).reshape(E, C, KOUT)
        z2 = jnp.concatenate([c[:, None, :] * y, s[:, None, :] * y], axis=2)
        return jax.lax.dot_general(
            z2.reshape(E * C, 2 * K), M.T, (((1,), (0,)), ((), ()))
        ).reshape(E, C, KOUT)

    J1 = M[:, :K]
    J2 = M[:, K:]

    @jax.jit
    def f_kminor_nocat(x, c, s):
        # two dots, no concat: multiplies can fuse into dot operands
        z1 = (c[:, None, :] * x).reshape(E * C, K)
        z2 = (s[:, None, :] * x).reshape(E * C, K)
        y = jax.lax.dot_general(z1, J1.T, (((1,), (0,)), ((), ())))
        y = y + jax.lax.dot_general(z2, J2.T, (((1,), (0,)), ((), ())))
        return y.reshape(E, C, KOUT)

    @jax.jit
    def f_emajor_nocat(x, c, s):
        y = jnp.einsum("ik,ekc->eic", J1, c[:, :, None] * x)
        return y + jnp.einsum("ik,ekc->eic", J2, s[:, :, None] * x)

    def bench(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        gb = (np.prod(out.shape) * 2 * 3) / 1e9  # rough traffic
        print(f"{name:18s} {dt*1e3:7.3f} ms   (~{gb/dt:.0f} GB/s)")

    print(f"E={E} K={K} C={C} bf16")
    bench("K-major einsum", f_kmajor, x_kec, cs, ss)
    bench("K-minor GEMM", f_kminor, x_eck, cs, ss)
    bench("E-major einsum", f_emajor, x_ekc, cs, ss)
    bench("K-minor 2stage", f_kminor_2stage, x_eck, cs, ss)
    bench("K-minor nocat", f_kminor_nocat, x_eck, cs, ss)
    bench("E-major nocat", f_emajor_nocat, x_ekc, cs, ss)


if __name__ == "__main__" and "--fused" not in sys.argv:
    main()


def bench_fused():
    import time
    import jax
    import jax.numpy as jnp
    from equivarianttransformermpnn4quantumcomputations_tpu.ops.irreps import (
        layout as get_layout,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.ops.rotation import (
        compute_wigner,
        _rotate_to_edge_factored,
    )
    from equivarianttransformermpnn4quantumcomputations_tpu.ops.pallas.rotate import (
        rotate_to_edge_fused,
    )

    E, C, LMAX, MMAX = 5120, 256, 4, 2
    rng = np.random.default_rng(0)
    vec = jnp.asarray(rng.normal(size=(E, 3)), jnp.float32)
    w = compute_wigner(LMAX, vec, dtype=jnp.float32)
    lay = get_layout(LMAX, MMAX)
    x = jnp.asarray(rng.normal(size=(E, (LMAX + 1) ** 2, C)), jnp.bfloat16)

    f1 = jax.jit(lambda x: rotate_to_edge_fused(w, x, lay))
    f2 = jax.jit(lambda x: _rotate_to_edge_factored(w, x, lay))
    for name, f in [("fused kernel", f1), ("xla factored", f2)]:
        out = f(x); jax.block_until_ready(out)
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"to_edge {name:14s} {dt*1e3:7.3f} ms")


if __name__ == "__main__" and "--fused" in sys.argv:
    bench_fused()
