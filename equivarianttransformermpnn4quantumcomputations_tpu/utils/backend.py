"""Backend targeting: which platform jitted code is about to run on.

``jax.default_backend()`` reports the highest-priority backend and ignores a
``jax.default_device(...)`` context, so code that routes between TPU pallas
kernels and plain-XLA paths mis-routes when a TPU-attached process
deliberately computes on the host CPU (e.g. ``trainer.init_params_host``,
which initializes flagship parameters on the host to skip the ~10-min
on-device init compile).  All kernel/path routing in this package goes
through ``on_tpu()`` / ``target_platform()``, which consult an explicit
override first.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax

__all__ = ["compute_on", "target_platform", "on_tpu"]

# ContextVar, not a module global: an override held by one thread (or async
# task) must not leak into traces running concurrently on another (ADVICE r3).
_override: contextvars.ContextVar[str | None] = contextvars.ContextVar(
    "etq_platform", default=None
)


@contextlib.contextmanager
def compute_on(platform: str):
    """Declare that enclosed traces/executions target ``platform``
    ("cpu" | "tpu"), overriding ``jax.default_backend()`` for routing."""
    token = _override.set(platform)
    try:
        yield
    finally:
        _override.reset(token)


def target_platform() -> str:
    return _override.get() or jax.default_backend()


def on_tpu() -> bool:
    return target_platform() == "tpu"
