"""Version reporting (ref src/timg-print-version.cc)."""

from __future__ import annotations

import sys


def print_component_versions() -> int:
    """Print our version plus every dependency's (ref timg-print-version.cc:59-128)."""
    from timg_tpu import __version__

    print(f"timg-tpu {__version__} <https://github.com/timg-tpu>")
    print("TPU-native terminal image & video viewer (JAX/XLA/Pallas).")
    print()
    try:
        import jax
        print(f"jax {jax.__version__}; backend: "
              f"{jax.default_backend()} ({len(jax.devices())} device(s))")
    except Exception as e:  # pragma: no cover
        print(f"jax unavailable: {e}")
    try:
        import numpy
        print(f"numpy {numpy.__version__}")
    except ImportError:
        pass
    try:
        import PIL
        print(f"Pillow {PIL.__version__} (image decode)")
    except ImportError:
        print("Pillow not available")
    try:
        from timg_tpu.native import runtime
        print(f"native runtime: {runtime.describe()}")
    except Exception:
        print("native runtime: not built (python fallbacks active)")
    print(f"python {sys.version.split()[0]}")
    print("Half, quarter, sixel, iterm2, and kitty graphics output: builtin.")
    return 0
