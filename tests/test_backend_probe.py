"""Device-wedge liveness probe (ops/backend.py).

The dev tunnel exhibited a failure mode where every device dispatch (or
every device->host fetch) blocks forever with ~0 CPU while
jax.devices() still lists the chip (ROADMAP "round 5: device-tunnel
wedge").  device_alive() round-trips one tiny value with a timeout and,
on a wedge, reroutes the whole run to the strict host mirrors -- the
reference's behavior class (keep rendering) over a silent hang.
"""

import os
import time

import pytest

from timg_tpu.ops import backend


@pytest.fixture
def fresh_probe(monkeypatch):
    """Reset the cached probe result around a test and restore the
    default-device override the wedge fallback may have installed."""
    monkeypatch.setattr(backend, "_probe_result", None)
    monkeypatch.delenv("TIMG_TPU_FORCE_NUMPY", raising=False)
    monkeypatch.delenv("TIMG_TPU_DEVICE_PROBE_TIMEOUT_S", raising=False)
    yield
    backend._probe_result = None
    # The wedge fallback mutates os.environ itself; monkeypatch.delenv
    # on an *absent* var records nothing, so scrub explicitly or the
    # var leaks into every later test (observed: the serve suite's
    # server answers "delegate" when the client env carries it).
    os.environ.pop("TIMG_TPU_FORCE_NUMPY", None)
    import jax

    if jax.config.jax_default_device is not None:
        jax.config.update("jax_default_device", None)


def test_cpu_backend_short_circuits(fresh_probe):
    # On the test suite's CPU backend the probe dispatches nothing and
    # reports alive immediately.
    t0 = time.time()
    assert backend.device_alive() is True
    assert time.time() - t0 < 5.0
    assert not backend.device_wedged()
    assert "TIMG_TPU_FORCE_NUMPY" not in os.environ


def test_timeout_zero_disables_probe(fresh_probe, monkeypatch):
    monkeypatch.setenv("TIMG_TPU_DEVICE_PROBE_TIMEOUT_S", "0")

    def boom():  # the probe computation must never run
        raise AssertionError("probe dispatched despite timeout=0")

    monkeypatch.setattr(backend, "_probe_compute", boom)
    assert backend.device_alive() is True
    assert not backend.device_wedged()


def test_wedge_reroutes_to_host(fresh_probe, monkeypatch, capsys):
    monkeypatch.setenv("TIMG_TPU_DEVICE_PROBE_TIMEOUT_S", "0.05")
    monkeypatch.setattr(backend, "_probe_compute",
                        lambda: time.sleep(5.0) or True)

    assert backend.device_alive() is False
    assert backend.device_wedged()
    # The fallback routes mirror-routed ops to numpy ...
    assert os.environ.get("TIMG_TPU_FORCE_NUMPY") == "1"
    assert backend.use_numpy()
    # ... pins residual jax dispatches onto the CPU device ...
    assert backend.dispatch_platform() == "cpu"
    # ... and tells the user once on stderr.
    err = capsys.readouterr().err
    assert "unresponsive" in err
    # Routing: sustained pipelines now stay on host.
    assert backend.prefer_host(1, sustained=True)
    assert backend.prefer_host(1000, sustained=False)


def test_probe_result_is_cached(fresh_probe, monkeypatch):
    calls = []

    def probe_once():
        calls.append(1)
        return True

    monkeypatch.setenv("TIMG_TPU_DEVICE_PROBE_TIMEOUT_S", "10")
    monkeypatch.setattr(backend, "_probe_compute", probe_once)
    assert backend.device_alive() is True
    assert backend.device_alive() is True
    assert len(calls) == 1


def test_alive_device_keeps_routing(fresh_probe, monkeypatch):
    monkeypatch.setenv("TIMG_TPU_DEVICE_PROBE_TIMEOUT_S", "10")
    monkeypatch.setattr(backend, "_probe_compute", lambda: True)
    assert not backend.prefer_host(1, sustained=True)
    assert not backend.prefer_host(1000, sustained=False)
    # Small one-shots stay on host without consulting the probe.
    assert backend.prefer_host(1, sustained=False)


def test_dispatch_platform_tracks_default_device(fresh_probe):
    import jax

    assert backend.dispatch_platform() == jax.default_backend()
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    try:
        assert backend.dispatch_platform() == "cpu"
    finally:
        jax.config.update("jax_default_device", None)
