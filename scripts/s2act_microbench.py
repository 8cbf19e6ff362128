"""S2-activation kernel microbench: production kernel vs candidate variants.

VERDICT r2 #7: attack the K=19 contraction padding in the fused S2-act
kernel (ops/pallas/s2act.py).  This script times, at the two flagship call
sites (attention edge grid [5120, 19, H] and FFN node grid [256, 25, C],
grid 18x18):

  * xla   — plain to_grid -> silu -> from_grid (no pallas)
  * v0    — production s2act_fused
  * v1    — explicit 2D-dot kernel: in-kernel [T,K,C]->[K,T*C] swap, P padded
            to a sublane multiple, single [P,K]@[K,T*C] GEMMs
  * v2    — v1 with a larger node tile (VMEM budget raised)
  * v3    — P-blocked accumulation: grid over (tiles, cblk, pblk), x resident,
            out accumulated across P blocks -> T up to 128

fwd / grad / grad-of-grad (the training op is inside force training).
Run on TPU:  python scripts/s2act_microbench.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (T, Pb) tile choices for the v3 P-blocked kernel; empty by default (the
# variant was probed and rejected in round 3 — PERF.md).  Set via env, e.g.
# ETQ_S2_MB_V3="128:8,64:16" to re-probe.
V3_VARIANTS = [
    tuple(int(v) for v in pair.split(":"))
    for pair in os.environ.get("ETQ_S2_MB_V3", "").split(",")
    if pair
]


def timeit(fn, *args, reps=30):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from equivarianttransformermpnn4quantumcomputations_tpu.ops.s2grid import s2grid
    from equivarianttransformermpnn4quantumcomputations_tpu.ops.pallas import s2act as prod

    try:
        from jax.experimental.pallas import tpu as pltpu

        VMEM = pltpu.VMEM
    except Exception:
        VMEM = None

    interpret = jax.default_backend() != "tpu"

    def bspec(shape, index_map=None):
        kw = {"memory_space": VMEM} if VMEM is not None else {}
        return pl.BlockSpec(shape, index_map, **kw)

    def silu(z):
        return z * jax.nn.sigmoid(z)

    # ---- v1/v2: explicit 2D dots, padded P ---------------------------------
    def k1_2d(a_ref, f_ref, x_ref, o_ref):
        T, K, C = x_ref.shape
        x = jnp.swapaxes(x_ref[:], 0, 1).reshape(K, T * C)
        A = a_ref[:].astype(x.dtype)
        F = f_ref[:].astype(x.dtype)
        g = jax.lax.dot_general(
            A, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [P, T*C]
        sg = silu(g).astype(x.dtype)
        out = jax.lax.dot_general(
            F, sg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [K, T*C]
        o_ref[:] = jnp.swapaxes(out.reshape(K, T, C), 0, 1).astype(o_ref.dtype)

    def call_2d(A, F, x, budget_mb):
        N, K, C = x.shape
        P = A.shape[0]
        Pp = -(-P // 8) * 8
        if Pp != P:
            A = np.pad(A, ((0, Pp - P), (0, 0)))
            F = np.pad(F, ((0, Pp - P), (0, 0)))
        budget = budget_mb * 1024 * 1024
        t = budget // max(1, 2 * Pp * C * 4)
        t = max(1, min(128, int(t)))
        T = 1 << (t.bit_length() - 1)
        n_tiles = -(-N // T)
        pad = n_tiles * T - N
        xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x
        res = pl.pallas_call(
            k1_2d,
            grid=(n_tiles,),
            in_specs=[
                bspec((Pp, K), lambda i: (0, 0)),
                bspec((Pp, K), lambda i: (0, 0)),
                bspec((T, K, C), lambda i: (i, 0, 0)),
            ],
            out_specs=bspec((T, K, C), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_tiles * T, K, C), x.dtype),
            interpret=interpret,
        )(jnp.asarray(A), jnp.asarray(F), xp)
        return res[:N] if pad else res

    # ---- v3: P-blocked accumulation ----------------------------------------
    def k1_pblk(a_ref, f_ref, x_ref, o_ref, acc_ref):
        p = pl.program_id(1)
        T, K, C = x_ref.shape
        x = jnp.swapaxes(x_ref[:], 0, 1).reshape(K, T * C)
        A = a_ref[:].astype(x.dtype)
        F = f_ref[:].astype(x.dtype)
        g = jax.lax.dot_general(
            A, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        sg = silu(g).astype(x.dtype)
        out = jax.lax.dot_general(
            F, sg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        @pl.when(p == 0)
        def _():
            acc_ref[:] = out

        @pl.when(p > 0)
        def _():
            acc_ref[:] = acc_ref[:] + out

        @pl.when(p == pl.num_programs(1) - 1)
        def _():
            o_ref[:] = jnp.swapaxes(
                acc_ref[:].reshape(K, T, C), 0, 1
            ).astype(o_ref.dtype)

    def call_pblk(A, F, x, T, Pb):
        import jax

        N, K, C = x.shape
        P = A.shape[0]
        Pp = -(-P // Pb) * Pb
        if Pp != P:
            A = np.pad(A, ((0, Pp - P), (0, 0)))
            F = np.pad(F, ((0, Pp - P), (0, 0)))
        n_p = Pp // Pb
        n_tiles = -(-N // T)
        pad = n_tiles * T - N
        xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x
        from jax.experimental.pallas import tpu as _pltpu

        kwargs = {"scratch_shapes": [_pltpu.VMEM((K, T * C), jnp.float32)]}
        res = pl.pallas_call(
            k1_pblk,
            grid=(n_tiles, n_p),
            in_specs=[
                bspec((Pb, K), lambda i, p: (p, 0)),
                bspec((Pb, K), lambda i, p: (p, 0)),
                bspec((T, K, C), lambda i, p: (i, 0, 0)),
            ],
            out_specs=bspec((T, K, C), lambda i, p: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_tiles * T, K, C), x.dtype),
            interpret=interpret,
            **kwargs,
        )(jnp.asarray(A), jnp.asarray(F), xp)
        return res[:N] if pad else res

    sites = [
        ("attn_edge", 5120, s2grid(4, 2, 18), 128),
        ("ffn_node", 256, s2grid(4, 4, 18), 512),
        ("ffn_node_qm9", 960, s2grid(4, 4, 18), 512),
    ]
    dt = jnp.bfloat16 if os.environ.get("BF16", "1") == "1" else jnp.float32
    rng = np.random.default_rng(0)

    for name, N, grid, C in sites:
        K = grid.to_grid_mat.shape[-1]
        P = grid.res_beta * grid.res_alpha
        A = np.asarray(grid.to_grid_mat, np.float32).reshape(P, K)
        F = np.asarray(grid.from_grid_mat, np.float32).reshape(P, K)
        x = jnp.asarray(rng.normal(size=(N, K, C)), dtype=dt)
        print(f"== {name}: [{N}, {K}, {C}] grid {grid.res_beta}x{grid.res_alpha} "
              f"dtype {dt.__name__}")

        ref = jax.jit(lambda x: grid.from_grid(silu(grid.to_grid(x))))
        f0 = jax.jit(lambda x: prod.s2act_fused(x, grid))
        f1 = jax.jit(functools.partial(call_2d, A, F, budget_mb=10))
        f2 = jax.jit(functools.partial(call_2d, A, F, budget_mb=20))

        out_ref = np.asarray(ref(x), np.float32)
        for nm, fn in [("xla", ref), ("v0_prod", f0), ("v1_2d", f1),
                       ("v2_2d_bigT", f2)]:
            try:
                o = np.asarray(fn(x), np.float32)
                err = np.abs(o - out_ref).max()
                ms = timeit(fn, x)
                print(f"  fwd {nm:12s} {ms:7.3f} ms   maxerr {err:.2e}")
            except Exception as e:
                print(f"  fwd {nm:12s} FAILED: {type(e).__name__}: {e}")
        # v3 P-blocked accumulation variants (pass e.g. [(128, 8)] to probe;
        # rejected in round 3: no faster than v1/v2 and most (T, Pb) choices
        # violate Mosaic's 8/128 divisibility — see PERF.md)
        for T, Pb in V3_VARIANTS:
            nm = f"v3_T{T}_Pb{Pb}"
            try:
                fn = jax.jit(functools.partial(call_pblk, A, F, T=T, Pb=Pb))
                o = np.asarray(fn(x), np.float32)
                err = np.abs(o - out_ref).max()
                ms = timeit(fn, x)
                print(f"  fwd {nm:12s} {ms:7.3f} ms   maxerr {err:.2e}")
            except Exception as e:
                print(f"  fwd {nm:12s} FAILED: {type(e).__name__}: {e}")

        # training path of the production kernel: grad + grad-of-grad
        def loss0(x):
            return jnp.sum(prod.s2act_fused(x, grid).astype(jnp.float32) ** 2)

        g0 = jax.jit(jax.grad(loss0))

        def loss2(x):
            return jnp.sum(jax.grad(loss0)(x).astype(jnp.float32) ** 2)

        gg0 = jax.jit(jax.grad(loss2))
        print(f"  grad  v0_prod    {timeit(g0, x):7.3f} ms")
        print(f"  grad2 v0_prod    {timeit(gg0, x):7.3f} ms")

        def loss_ref(x):
            return jnp.sum(ref(x).astype(jnp.float32) ** 2)

        gr = jax.jit(jax.grad(loss_ref))

        def loss2r(x):
            return jnp.sum(jax.grad(loss_ref)(x).astype(jnp.float32) ** 2)

        ggr = jax.jit(jax.grad(loss2r))
        print(f"  grad  xla        {timeit(gr, x):7.3f} ms")
        print(f"  grad2 xla        {timeit(ggr, x):7.3f} ms")

        # production XLA path wraps the act in jax.checkpoint (memory lever)
        ck = jax.checkpoint(
            lambda x: grid.from_grid(silu(grid.to_grid(x)))
        )

        def loss_ck(x):
            return jnp.sum(ck(x).astype(jnp.float32) ** 2)

        def loss2c(x):
            return jnp.sum(jax.grad(loss_ck)(x).astype(jnp.float32) ** 2)

        print(f"  grad  xla_ckpt   {timeit(jax.jit(jax.grad(loss_ck)), x):7.3f} ms")
        print(f"  grad2 xla_ckpt   {timeit(jax.jit(jax.grad(loss2c)), x):7.3f} ms")


if __name__ == "__main__":
    main()
