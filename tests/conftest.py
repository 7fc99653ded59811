"""Test configuration: force a virtual 8-device CPU mesh.

Must run before any jax import. The container's axon sitecustomize hangs
jax import when JAX_PLATFORMS=cpu while PALLAS_AXON_POOL_IPS is set, so
that variable is cleared here.
"""

import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
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
