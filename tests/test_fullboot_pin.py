"""The slim boot must keep TIMG_TPU_FORCE_NUMPY honest (round 4).

Pod images ship a sitecustomize whose PJRT registration forcibly
selects the accelerator via ``jax.config.update("jax_platforms",
"axon,cpu")`` — overriding the ``JAX_PLATFORMS=cpu`` env pin
cli._force_host_backend sets *before* the slim boot's deferred shim
import runs.  Until round 4 every subprocess "CPU reference" run
(``TIMG_TPU_FORCE_NUMPY=1 ./timg-tpu ...``) therefore silently
computed on the remote device — and hung unkillably when the device
tunnel stalled mid-fetch.  _JaxBootHook now re-pins cpu right after
the shim runs; these tests pin that contract.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fake_shim(tmp_path):
    """A directory with a stub jax package plus a sitecustomize that
    config-stomps the platform the way the pod shim does
    (axon/register/pjrt.py: config.update("jax_platforms",
    "axon,cpu"))."""
    shim_dir = tmp_path / "shim"
    (shim_dir / "jax").mkdir(parents=True)
    (shim_dir / "jax" / "__init__.py").write_text(textwrap.dedent("""
        import types
        config = types.SimpleNamespace(updates=[])
        config.update = lambda k, v: config.updates.append((k, v))
    """))
    (shim_dir / "sitecustomize.py").write_text(textwrap.dedent("""
        import jax
        jax.config.update("jax_platforms", "axon,cpu")
    """))
    return shim_dir


def test_boot_hook_repins_cpu_after_shim(tmp_path, monkeypatch):
    """Hermetic: a fake pod shim that config-stomps the platform runs
    under the boot hook; the hook's re-pin must land AFTER it."""
    shim_dir = _fake_shim(tmp_path)
    code = textwrap.dedent("""
        import sys
        sys.path.insert(0, %r)
        sys.path.insert(0, %r)
        import os
        os.environ["TIMG_TPU_FORCE_NUMPY"] = "1"
        os.environ["JAX_PLATFORMS"] = "cpu"
        from timg_tpu._fullboot import _JaxBootHook
        sys.meta_path.insert(0, _JaxBootHook())
        import jax   # stub from the fake shim
        print(jax.config.updates)
    """) % (str(shim_dir), REPO)
    r = subprocess.run([sys.executable, "-S", "-c", code],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    updates = eval(r.stdout.strip())
    assert updates[0] == ("jax_platforms", "axon,cpu")
    assert updates[-1] == ("jax_platforms", "cpu"), updates


def test_boot_hook_without_force_numpy_keeps_shim_choice(tmp_path):
    """Without FORCE_NUMPY the shim's platform selection stands."""
    shim_dir = _fake_shim(tmp_path)
    code = textwrap.dedent("""
        import sys
        sys.path.insert(0, %r)
        sys.path.insert(0, %r)
        import os
        os.environ.pop("TIMG_TPU_FORCE_NUMPY", None)
        from timg_tpu._fullboot import _JaxBootHook
        sys.meta_path.insert(0, _JaxBootHook())
        import jax
        print(jax.config.updates)
    """) % (str(shim_dir), REPO)
    r = subprocess.run([sys.executable, "-S", "-c", code],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    updates = eval(r.stdout.strip())
    assert updates == [("jax_platforms", "axon,cpu")], updates


def _pod_shim_ips():
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        return os.environ["PALLAS_AXON_POOL_IPS"]
    # tests/ is not a package; pytest imports conftest as a top-level
    # module (rootdir-inserted) — find the live instance.
    for name in ("conftest", "tests.conftest"):
        mod = sys.modules.get(name)
        if mod is not None and getattr(mod, "SAVED_POOL_IPS", None):
            return mod.SAVED_POOL_IPS
    return None


@pytest.mark.skipif(_pod_shim_ips() is None,
                    reason="no pod shim in this environment")
def test_slim_boot_force_numpy_stays_on_cpu_with_real_shim():
    """Against the REAL pod shim: a slim-boot interpreter with the
    FORCE_NUMPY pin must end up on the cpu backend (this is the exact
    configuration that used to route 'CPU reference' subprocess runs
    through the device tunnel)."""
    code = textwrap.dedent("""
        import sys
        sys.path.insert(0, %r)
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        from timg_tpu import _fullboot
        _fullboot._add_site_packages()
        sys.meta_path.insert(0, _fullboot._JaxBootHook())
        import jax
        print(jax.default_backend())
    """) % REPO
    env = dict(os.environ)
    env["TIMG_TPU_FORCE_NUMPY"] = "1"
    env["PALLAS_AXON_POOL_IPS"] = _pod_shim_ips()
    env.pop("PYTHONPATH", None)
    # the conftest scrub must not leak into the probe: the shim only
    # engages with its pool var set, and the probe pins cpu itself
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, "-S", "-c", code],
                       capture_output=True, text=True, timeout=300,
                       env=env)
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip() == "cpu", (r.stdout, r.stderr[-300:])
