"""Automatic multi-device routing for the CLI's sustained dispatches.

The reference fans decode work across host threads (ref
src/timg.cc:946-968); the TPU-native analog shards the *frame batch
axis* of every sustained device dispatch (video windows, animation
windows, batched dither planes) across a 1-D ``('data',)`` device mesh.
Frames are independent through convert/resize/dither/block selection,
so this is pure data parallelism: no collectives, and the sharded
output is byte-identical to the single-device dispatch (enforced by
tests/test_multichip_cli.py and __graft_entry__.dryrun_multichip).

Opt-in: ``--devices N|auto`` on the CLI or ``TIMG_TPU_DEVICES`` in the
environment. Default is single-device (the routing layer returns None
and callers run their existing dispatch unchanged).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

_MESH_CACHE: dict = {}
_FN_CACHE: dict = {}


def configured_devices() -> int:
    """Requested device count: TIMG_TPU_DEVICES = int | 'auto'."""
    spec = os.environ.get("TIMG_TPU_DEVICES", "1").strip().lower()
    if spec in ("auto", "all"):
        try:
            import jax
            return len(jax.devices())
        except Exception:
            return 1
    try:
        return max(1, int(spec))
    except ValueError:
        return 1


def data_mesh():
    """Cached 1-D ('data',) mesh over the configured devices, or None
    when the session is single-device (the default)."""
    n = configured_devices()
    if n <= 1:
        return None
    try:
        import jax
        import numpy as np
        from jax.sharding import Mesh
    except Exception:
        return None
    devices = jax.devices()
    n = min(n, len(devices))
    if n <= 1:
        return None
    mesh = _MESH_CACHE.get(n)
    if mesh is None:
        mesh = Mesh(np.array(devices[:n]), axis_names=("data",))
        _MESH_CACHE[n] = mesh
    return mesh


def shard_batch_call(key: tuple, fn, batch_args: Sequence,
                     rep_args: Sequence = (),
                     fetch: bool = True) -> Optional[object]:
    """Run ``fn(*batch_args, *rep_args)`` with every batch arg's leading
    axis sharded over the data mesh; returns None when single-device
    (callers then run their unsharded dispatch).

    * ``key`` identifies the traced program (fn identity is unstable for
      closures; any closed-over static config must be part of the key).
    * The batch is padded to a multiple of the device count with repeats
      of the last element and the outputs sliced back — frames are
      independent, so padding cannot change the kept results.
    * ``rep_args`` are replicated on every device (palette tables etc.).
    * ``fetch=False`` returns device-resident jax arrays (pad rows
      sliced lazily) so callers can run follow-up dispatches — e.g. the
      sixel run-transport decision — before paying the D2H transfer.
    """
    mesh = data_mesh()
    if mesh is None:
        return None
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P

    n = mesh.devices.size
    b = batch_args[0].shape[0]
    pad = (-b) % n
    if pad:
        batch_args = [
            np.concatenate([np.asarray(a),
                            np.repeat(np.asarray(a)[-1:], pad, axis=0)])
            for a in batch_args
        ]

    cache_key = (key, n, len(batch_args), len(rep_args))
    wrapped = _FN_CACHE.get(cache_key)
    if wrapped is None:
        in_specs = tuple([P("data")] * len(batch_args)
                         + [P()] * len(rep_args))
        wrapped = jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=P("data"),
            check_vma=False))  # pallas out_shapes carry no vma
        _FN_CACHE[cache_key] = wrapped
    out = wrapped(*batch_args, *rep_args)
    if not fetch:
        if pad:
            return jax.tree.map(lambda x: x[:b], out)
        return out
    if pad:
        return jax.tree.map(lambda x: np.asarray(x)[:b], out)
    return jax.tree.map(np.asarray, out)


# Frames at/above this area route through the ('data', 'space') mesh
# when the batch is smaller than the device count: a single 4K still
# then uses every configured chip instead of one.  4K is 8.3 Mpx; the
# threshold sits at half that so cinema-2K+ class frames qualify too.
_SPATIAL_MIN_PIXELS = 2048 * 2048


def spatial_shard_call(key: tuple, fn, batch,
                       min_pixels: int = _SPATIAL_MIN_PIXELS
                       ) -> Optional[object]:
    """GSPMD ('data', 'space') dispatch for very large frames.

    Shards the frame batch over ``data`` and the image HEIGHT axis over
    ``space`` (parallel/mesh.py's layout, here reachable from the CLI's
    --devices routing): XLA GSPMD inserts the halo exchanges the
    vertical resize taps need across the space axis, and the result is
    byte-identical to the single-device dispatch
    (tests/test_parallel.py, tests/test_multichip_cli.py::*4k*).

    Applies only when it beats plain data parallelism: multi-device
    session, frames >= ``min_pixels``, and fewer frames than devices
    (otherwise shard_batch_call's pure data fan-out wastes nothing).
    ``fn`` must be an XLA-traceable pipeline (no Pallas kernels — those
    do not partition under GSPMD).  Returns None when not applicable.
    """
    n = configured_devices()
    if n <= 1:
        return None
    shape = batch.shape
    if len(shape) < 3 or shape[0] >= n \
            or shape[1] * shape[2] < min_pixels:
        return None
    try:
        import jax
        import numpy as np
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P
    except Exception:
        return None
    devices = jax.devices()
    n = min(n, len(devices))
    if n <= 1:
        return None
    b = shape[0]
    data = 1
    for cand in range(min(b, n), 0, -1):  # largest divisor of n <= b
        if n % cand == 0:
            data = cand
            break
    space = n // data
    mesh_key = ("spatial", data, space)
    mesh = _MESH_CACHE.get(mesh_key)
    if mesh is None:
        mesh = Mesh(np.array(devices[:n]).reshape(data, space),
                    axis_names=("data", "space"))
        _MESH_CACHE[mesh_key] = mesh
    cache_key = (key, data, space, len(shape))
    wrapped = _FN_CACHE.get(cache_key)
    if wrapped is None:
        spec = P("data", "space", *([None] * (len(shape) - 2)))
        wrapped = jax.jit(fn, in_shardings=NamedSharding(mesh, spec))
        _FN_CACHE[cache_key] = wrapped
    return np.asarray(wrapped(batch))
