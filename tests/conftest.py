"""Test configuration: force a virtual 8-device CPU mesh.

Must run before any jax import. The container's axon sitecustomize hangs
jax import when JAX_PLATFORMS=cpu while PALLAS_AXON_POOL_IPS is set, so
that variable is cleared here.
"""

import os
import sys

# Stashed for tests that spawn subprocesses needing the REAL pod shim
# active (tests/test_fullboot_pin.py); None when the env never had it.
SAVED_POOL_IPS = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

if "jax" in sys.modules:
    # Site customization may have imported jax at interpreter startup,
    # capturing JAX_PLATFORMS before we could scrub it; fix the live config.
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_BINARY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".refbuild", "src", "timg")


def has_reference() -> bool:
    return os.path.exists(REFERENCE_BINARY)


# --- dormant real-library suites (VERDICT r3 #4) ---------------------------
# Tests marked @pytest.mark.real_lib("<name>") validate bindings against
# the REAL library/binary. They skip in this image (libs absent) and
# auto-activate the moment an environment provides them; run the matrix
# with `pytest -m real_lib` (see COMPONENTS.md "real-library matrix").

def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "real_lib(name): dormant integration test against a real "
        "external library/binary; auto-skips when it is absent")


def real_lib_available(name: str) -> bool:
    import ctypes
    import shutil

    libs = {
        "libsixel": ("libsixel.so.1", "libsixel.so"),
        "poppler": ("libpoppler-glib.so.8", "libpoppler-glib.so"),
        "openslide": ("libopenslide.so.1", "libopenslide.so.0",
                      "libopenslide.so"),
    }
    if name in libs:
        for soname in libs[name]:
            try:
                ctypes.CDLL(soname)
                return True
            except OSError:
                continue
        return False
    if name in ("gs", "tmux"):
        return shutil.which(name) is not None
    return False


def pytest_runtest_setup(item):
    import pytest as _pytest

    for mark in item.iter_markers(name="real_lib"):
        name = mark.args[0]
        if not real_lib_available(name):
            _pytest.skip(f"real {name} not present in this environment "
                         "(dormant integration test)")
