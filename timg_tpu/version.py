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
    # Optional decoder gates, listed like the reference's per-feature
    # rows (ref timg-print-version.cc:59-128).
    print("QOI image loading")
    try:
        from timg_tpu.sources.svg_source import _load as _svg_load
        print("SVG rendering with librsvg + cairo"
              if _svg_load() is not None else
              "SVG rendering unavailable (librsvg not found)")
    except Exception:  # pragma: no cover
        pass
    try:
        from timg_tpu.sources.pdf_source import poppler_available
        print("PDF rendering with poppler-glib + cairo"
              if poppler_available() else
              "PDF rendering unavailable (poppler-glib not found)")
    except Exception:  # pragma: no cover
        pass
    try:
        from timg_tpu.sources.openslide_source import _lib as _slide_lib
        print("OpenSlide scientific-image loading"
              if _slide_lib() is not None else
              "OpenSlide unavailable (libopenslide not found)")
    except Exception:  # pragma: no cover
        pass
    print(f"python {sys.version.split()[0]}")
    print("Half, quarter, sixel, iterm2, and kitty graphics output: builtin.")
    return 0
