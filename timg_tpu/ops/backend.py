"""Backend selection without eagerly importing jax.

The CPU execution path uses strict numpy mirrors of the device ops for
two reasons (see ops/cpu_mirror.py); deciding that must not itself cost
a jax import (~1.5 s) in the one-shot CLI case.
"""

from __future__ import annotations

import os
import sys


def use_numpy() -> bool:
    """True when pixel ops should run their numpy mirrors."""
    if os.environ.get("TIMG_TPU_FORCE_NUMPY"):
        return True
    if device_forced():
        # Parity/bench/multichip harnesses pin every routed dispatch to
        # the jax path even on the CPU backend (e.g. the virtual-mesh
        # sharded-vs-single-device byte-identity test).
        return False
    if "jax" in sys.modules:
        try:
            import jax
            return jax.default_backend() == "cpu"
        except Exception:  # pragma: no cover
            return True
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms:
        return platforms.split(",")[0].strip() == "cpu"
    # No hint: import jax and ask (the device path needs it anyway).
    try:
        import jax
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        return True


def device_forced() -> bool:
    """TIMG_TPU_FORCE_DEVICE pins every routed dispatch to the device
    (parity/bench harnesses use it to exercise the device path on
    workloads the size heuristic would otherwise keep on host)."""
    return bool(os.environ.get("TIMG_TPU_FORCE_DEVICE"))


_DEVICE_MIN_BATCH = 64


def prefer_host(n_frames: int, sustained: bool = False) -> bool:
    """One-shot dispatch routing.

    A fresh XLA compile costs seconds (local chip) to minutes (dev
    tunnel) per input geometry, while the bit-exact host mirrors finish
    small workloads in milliseconds; the device only pays off where one
    compiled shape is reused across many dispatches.  ``sustained=True``
    marks such callers (video/scroll windows: fixed window geometry
    repeated for the whole stream) and always routes to the device.
    Everything else routes to host below TIMG_TPU_DEVICE_MIN_BATCH
    (default 64) frames.  SURVEY §7: batch wins must not regress the
    interactive `timg one-image.jpg` case.
    """
    if device_forced():
        return False
    if sustained:
        return False
    try:
        min_batch = int(os.environ.get("TIMG_TPU_DEVICE_MIN_BATCH",
                                       _DEVICE_MIN_BATCH))
    except ValueError:
        min_batch = _DEVICE_MIN_BATCH
    return n_frames < min_batch
