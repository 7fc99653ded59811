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
