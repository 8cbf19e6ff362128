"""Process-wide kernel-path flags — the former trace-time ``ETQ_*`` reads.

Environment variables are read ONCE, at import of this module.  The resolved
:class:`KernelFlags` are immutable for the life of the process unless
explicitly and *scopedly* overridden with :func:`override`.  Traced code
(module ``__call__`` bodies, the force/stress wrappers) consults
:func:`current` — never ``os.environ`` — so two traces of the same function
in one process can only disagree if a caller deliberately wrapped one of
them in ``override(...)`` (bench.py does, on throwaway wrapper functions
only).  This closes the trace-cache-poisoning class that produced the
round-3/4 bench bugs (PERF.md "measurement integrity"; VERDICT r4 #6).

The ``ETQ_*`` environment variables keep working as *process-level* knobs
for CLI entry points (bench.py, trainers, scripts) — they are simply no
longer consulted after import.
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
import os

__all__ = ["KernelFlags", "current", "override", "flags_from_env"]


@dataclasses.dataclass(frozen=True)
class KernelFlags:
    """Kernel/path selection, resolved once per process (or per override
    scope).  All choices are numerically identical paths — these pick
    implementations, never semantics."""

    # Wigner representation (ops/rotation.py, ops/pallas/rotate_dense.py):
    # 'auto' -> 'dense' on TPU (pairs kernel, D built once per forward,
    # 43.1 g/s) else 'factored' (5-stage chain); 'blocks' = per-degree XLA
    # bmm (slow; kept for A/B). See PERF.md "dense-Wigner pairs kernel".
    wigner: str = "auto"
    # Fused 5-stage rotate pallas kernel for the factored path:
    # 'auto' -> on TPU; 'on' forces (interpret mode off-TPU, test use).
    fused_rotate: str = "auto"
    # Fused S2-activation kernel (ops/pallas/s2act.py): 'auto' -> on TPU,
    # 'off' -> plain XLA everywhere, 'force' -> even off-TPU (interpret
    # mode; tests exercise the kernel AD chain on CPU).
    s2_fused: str = "auto"
    # Route S2 sites with fewer than this many (static, padded) leading rows
    # to the plain-XLA path.  0 = kernel everywhere on TPU (measured best
    # composed into the training step; PERF.md round-3 S2 rework).
    s2_fused_min_rows: int = 0
    # jax.checkpoint around the XLA S2 activation (grid-space pre-activation
    # is the dominant AD residual; the fused kernel makes this moot).
    s2_ckpt: bool = True
    # Chunked lax.map fallback sizes for the XLA S2 path (MB).
    s2_chunk_mb: int = 256
    s2_chunk_threshold_mb: int = 1024
    # m0-only rotate/conv shortcut for GATA value paths (exactly equal
    # outputs; tests/test_variants.py). PERF.md "m0-only rotate/conv".
    m0_only: bool = True
    # Fused full SO(2)-conv kernel (ops/pallas/so2conv.py): 'auto' = OFF
    # (measured a composed-step regression despite a ~3x isolated-site win
    # — PERF.md round 5); 'on' enables on TPU, 'force' even off-TPU
    # (interpret mode, tests).
    conv_fused: str = "auto"
    # jax.checkpoint around the inner energy fn of the force autograd
    # (trade ~40% step time for HBM headroom; PERF.md round-4 final).
    inner_ckpt: bool = False


def _bool(v: str | None, default: bool) -> bool:
    if v is None or v == "":
        return default
    return v not in ("0", "false", "off", "no")


def flags_from_env() -> KernelFlags:
    """Resolve a KernelFlags from ``ETQ_*`` environment variables (legacy
    spellings accepted).  Called once at import; CLI entry points may call
    it again explicitly after mutating os.environ (bench.py does not need
    to — it sets knobs before importing the package)."""
    g = os.environ.get
    s2f = g("ETQ_S2_FUSED", "")
    s2_fused = {"": "auto", "1": "auto", "0": "off"}.get(s2f, s2f)
    fr = g("ETQ_FUSED_ROTATE", "")
    fused_rotate = {"": "auto", "1": "on", "0": "off", "false": "off",
                    "off": "off"}.get(fr, fr)
    wig = g("ETQ_WIGNER", "")
    cf = g("ETQ_CONV_FUSED", "")
    conv_fused = {"": "auto", "1": "auto", "0": "off"}.get(cf, cf)
    return KernelFlags(
        wigner=wig if wig else "auto",
        fused_rotate=fused_rotate,
        s2_fused=s2_fused,
        conv_fused=conv_fused,
        s2_fused_min_rows=int(g("ETQ_S2_FUSED_MIN_ROWS", 0)),
        s2_ckpt=_bool(g("ETQ_S2_CKPT"), True),
        s2_chunk_mb=int(g("ETQ_S2_CHUNK_MB", 256)),
        s2_chunk_threshold_mb=int(g("ETQ_S2_CHUNK_THRESHOLD_MB", 1024)),
        m0_only=_bool(g("ETQ_M0_ONLY"), True),
        inner_ckpt=_bool(g("ETQ_INNER_CKPT"), False),
    )


_DEFAULT: KernelFlags = flags_from_env()

# ContextVar (not a module global): an override held by one thread/async
# task must not leak into traces running concurrently on another.
_override: contextvars.ContextVar[KernelFlags | None] = contextvars.ContextVar(
    "etq_kernel_flags", default=None
)


def current() -> KernelFlags:
    """The flags in effect: innermost ``override`` scope, else the
    import-time environment resolution."""
    ov = _override.get()
    return ov if ov is not None else _DEFAULT


def patched(**kw) -> KernelFlags:
    """A copy of the current flags with fields replaced.  For pytest:
    ``monkeypatch.setattr(flags, "_DEFAULT", flags.patched(s2_fused="off"))``
    pins the process default for the duration of one test (restored by
    monkeypatch), which unlike :func:`override` also covers code the test
    calls indirectly in other contexts/threads."""
    return dataclasses.replace(current(), **kw)


@contextlib.contextmanager
def override(**kw):
    """Scoped flag override (tests / bench probes).  Any function traced
    under this context must be a throwaway — never a function object that
    will later be jitted with different flags (trace caches are keyed on
    function identity, not flags)."""
    token = _override.set(dataclasses.replace(current(), **kw))
    try:
        yield
    finally:
        _override.reset(token)
