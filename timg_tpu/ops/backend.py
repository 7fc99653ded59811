"""Backend selection without eagerly importing jax.

The CPU execution path uses strict numpy mirrors of the device ops for
two reasons (see ops/cpu_mirror.py); deciding that must not itself cost
a jax import (~1.5 s) in the one-shot CLI case.
"""

from __future__ import annotations

import os
import sys
import threading

_probe_lock = threading.Lock()


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


def dispatch_platform() -> str:
    """The platform an uncommitted dispatch actually lands on.

    Honors a ``jax_default_device`` override -- the wedge fallback in
    device_alive() pins it to the CPU device mid-process, after which
    keying kernel choices on ``jax.default_backend()`` (still the
    device platform) would route Pallas kernels onto the CPU backend
    and fail with "Only interpret mode is supported".  With no
    override this is exactly ``jax.default_backend()``."""
    import jax
    dd = jax.config.jax_default_device
    if dd is not None:
        p = getattr(dd, "platform", None)
        if p:
            return p
    return jax.default_backend()


def device_forced() -> bool:
    """TIMG_TPU_FORCE_DEVICE pins every routed dispatch to the device
    (parity/bench harnesses use it to exercise the device path on
    workloads the size heuristic would otherwise keep on host)."""
    return bool(os.environ.get("TIMG_TPU_FORCE_DEVICE"))


_DEVICE_MIN_BATCH = 64

# None = not yet probed; True = responsive; False = wedged.
_probe_result = None


def device_wedged() -> bool:
    """True only when a liveness probe RAN and timed out (the CLI uses
    this to exit via os._exit: the probe's daemon thread stays blocked
    in native code and would abort normal interpreter teardown)."""
    return _probe_result is False


def device_alive() -> bool:
    """One cached liveness probe of the active non-CPU backend.

    A wedged device link -- observed on the dev tunnel: every dispatch
    blocks forever with ~0 CPU while jax.devices() still lists the
    chip -- would otherwise hang every sustained pipeline with no
    output.  The probe runs a tiny computation in a daemon thread and
    waits TIMG_TPU_DEVICE_PROBE_TIMEOUT_S (default 30 s; 0 disables
    the probe and always trusts the device).  On timeout the process
    reroutes to the strict host mirrors once, with a stderr notice --
    the reference's behavior class (keep rendering) over a silent
    hang.  The CPU backend short-circuits: no dispatch, no cost.
    """
    global _probe_result
    if _probe_result is not None:
        return _probe_result
    with _probe_lock:
        if _probe_result is not None:  # lost the race: reuse the result
            return _probe_result
        return _device_alive_locked()


def _device_alive_locked():
    global _probe_result
    try:
        timeout = float(
            os.environ.get("TIMG_TPU_DEVICE_PROBE_TIMEOUT_S", "30"))
    except ValueError:
        timeout = 30.0
    if timeout <= 0:
        _probe_result = True
        return True

    setup = threading.Event()
    ok = threading.Event()

    def _probe():
        try:
            _probe_setup()
            setup.set()
            if _probe_compute():
                ok.set()
        except Exception:  # pragma: no cover - import/device errors
            pass

    t = threading.Thread(target=_probe, daemon=True,
                         name="timg-device-probe")
    t.start()
    # Two-phase budget: jax import + device attach legitimately cost
    # ~1.5 s + ~10 s through the dev tunnel on a HEALTHY link, and the
    # first dispatch pays a compile round trip -- lumping them into one
    # window misclassifies a slow-but-live link as wedged.  Setup gets
    # its own full window; the dispatch round trip gets another.
    alive = setup.wait(timeout) and ok.wait(timeout)
    if not alive:
        print("timg-tpu: device backend unresponsive after %.0f s; "
              "falling back to host mirrors for this run "
              "(TIMG_TPU_DEVICE_PROBE_TIMEOUT_S tunes or disables the "
              "probe)" % timeout, file=sys.stderr)
        # Route EVERYTHING away from the wedged device: the env knob
        # flips use_numpy() for the mirror-routed ops, and the default
        # device pins residual jax dispatches (the fused video jits are
        # bit-identical on every backend) onto the CPU backend.
        os.environ["TIMG_TPU_FORCE_NUMPY"] = "1"
        try:
            import jax
            jax.config.update("jax_default_device",
                              jax.devices("cpu")[0])
        except Exception:  # pragma: no cover
            pass
    _probe_result = alive
    return alive


def _probe_setup() -> None:
    """Import + attach phase of the liveness probe (test seam): pays
    the jax import and backend discovery, no dispatch."""
    import jax
    jax.default_backend()


def _probe_compute() -> bool:
    """The dispatch the liveness probe round-trips (test seam).

    The observed wedge mode completes execution (block_until_ready
    returns) while every device->host fetch blocks forever -- the probe
    must round-trip an actual VALUE to prove the link works end to end.
    """
    import jax
    import jax.numpy as jnp
    if jax.default_backend() == "cpu":
        return True
    x = jnp.ones((8, 8))
    return float((x @ x)[0, 0]) == 8.0


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
        return not device_alive()
    try:
        min_batch = int(os.environ.get("TIMG_TPU_DEVICE_MIN_BATCH",
                                       _DEVICE_MIN_BATCH))
    except ValueError:
        min_batch = _DEVICE_MIN_BATCH
    if n_frames < min_batch:
        return True
    return not device_alive()
