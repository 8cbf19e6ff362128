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
        uniform_blocks=True,
    )
    rng = np.random.default_rng(0)
    raw = _synthetic_batch(
        rng, args.graphs, args.atoms, args.npad, args.epad,
        max_neighbors=20, uniform=True,
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


def _xplane_pb2():
    """Compile scripts/xplane.proto on demand (the env's
    tensorboard_plugin_profile protos are broken against its protobuf)."""
    import importlib
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    gen = os.path.join(here, "_gen")
    os.makedirs(gen, exist_ok=True)
    open(os.path.join(gen, "__init__.py"), "a").close()
    pb2 = os.path.join(gen, "xplane_pb2.py")
    if not os.path.exists(pb2) or os.path.getmtime(pb2) < os.path.getmtime(
        os.path.join(here, "xplane.proto")
    ):
        subprocess.run(
            ["protoc", f"-I{here}", f"--python_out={gen}", "xplane.proto"],
            check=True,
        )
    sys.path.insert(0, gen)
    return importlib.import_module("xplane_pb2")


def parse_xplane(xplane_path, top=40):
    """Aggregate per-HLO-op self time on the device plane."""
    xplane_pb2 = _xplane_pb2()

    xspace = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xspace.ParseFromString(f.read())

    import re

    def short(name: str) -> str:
        # '%fusion.123 = bf16[...] fusion(...), kind=kLoop ...' ->
        # ('fusion', 'kLoop') ; keep custom-call targets
        m = re.match(r"%?([\w.\-]+)\s*=", name)
        op = m.group(1) if m else name[:60]
        base = re.sub(r"[.\d]+$", "", op)
        kind = ""
        km = re.search(r"kind=(\w+)", name)
        if km:
            kind = ":" + km.group(1)
        cm = re.search(r'custom_call_target="([^"]+)"', name)
        if cm:
            kind = ":" + cm.group(1)
        return base + kind

    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            # events NEST on this line (a 'while' wraps its body ops):
            # compute per-op SELF time with an interval stack
            evs = sorted(
                (
                    (ev.offset_ps, ev.duration_ps, ev.metadata_id)
                    for ev in line.events
                ),
                key=lambda e: (e[0], -e[1]),
            )
            totals, counts = {}, {}
            stack = []  # (end_ps, name, child_time_accum_index)
            child_time = []

            def close(upto):
                while stack and stack[-1][0] <= upto:
                    end, nm, ci = stack.pop()
                    dur, cht = child_time[ci]
                    self_t = (dur - cht) / 1e12
                    totals[nm] = totals.get(nm, 0.0) + self_t
                    counts[nm] = counts.get(nm, 0) + 1
                    if stack:
                        pdur, pcht = child_time[stack[-1][2]]
                        child_time[stack[-1][2]] = (pdur, pcht + dur)

            for off, dur, mid in evs:
                close(off)
                name = short(ev_meta.get(mid, "?"))
                child_time.append((dur, 0))
                stack.append((off + dur, name, len(child_time) - 1))
            close(float("inf"))

            tot = sum(totals.values())
            print(
                f"\n== plane: {plane.name} line: {line.name} — "
                f"total SELF time {tot*1e3:.1f} ms =="
            )
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
