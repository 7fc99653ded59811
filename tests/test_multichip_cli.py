"""CLI-level multi-chip routing: sharded == single-device, byte for byte.

VERDICT r2 #2: the ('data',) mesh pipelines must be reachable from the
CLI (--devices / TIMG_TPU_DEVICES), with byte-identical output streams.
Runs on the virtual 8-CPU mesh (conftest forces
xla_force_host_platform_device_count=8); TIMG_TPU_FORCE_DEVICE pins the
routed dispatches to the jax path so the sharded code actually runs.
"""

import os
import tempfile

import numpy as np
import pytest

from timg_tpu.cli import main as cli_main

pytest.importorskip("jax")


def _make_y4m(path: str, w=64, h=48, n=6) -> None:
    rng = np.random.default_rng(42)
    with open(path, "wb") as f:
        f.write(("YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n"
                 % (w, h)).encode())
        for i in range(n):
            y = (np.linspace(20, 235, w, dtype=np.uint8)[None, :]
                 .repeat(h, 0) + i * 7).astype(np.uint8)
            y[4 + i * 2:10 + i * 2, 8:40] = 16  # moving block: real diffs
            u = rng.integers(100, 156, (h // 2, w // 2), dtype=np.uint8)
            v = rng.integers(100, 156, (h // 2, w // 2), dtype=np.uint8)
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


@pytest.fixture(scope="module")
def y4m():
    d = tempfile.mkdtemp(prefix="timg_mc_")
    p = os.path.join(d, "v.y4m")
    _make_y4m(p)
    return p


def _run(argv, out, monkeypatch, devices=None):
    monkeypatch.setenv("TIMG_TPU_FORCE_DEVICE", "1")
    monkeypatch.delenv("TIMG_TPU_FORCE_NUMPY", raising=False)
    monkeypatch.delenv("TIMG_TPU_DEVICES", raising=False)
    full = list(argv) + ["-o", out]
    if devices is not None:
        full = ["--devices", str(devices)] + full
    rc = cli_main(full)
    # --devices mutates the env for the dispatch layer; scrub it so the
    # next in-process run starts clean.
    os.environ.pop("TIMG_TPU_DEVICES", None)
    assert rc == 0
    with open(out, "rb") as f:
        return f.read()


BASE = ["-g40x12", "--debug-no-frame-delay", "-b", "black"]


@pytest.mark.parametrize("mode", [
    ["-pq"],
    ["-ph"],
    ["-p", "sixel", "--dither=cube"],
    ["-p", "sixel", "--dither=adaptive"],
    ["-p", "sixel", "--dither=libsixel"],
])
def test_video_sharded_matches_single_device(mode, y4m, tmp_path,
                                             monkeypatch):
    argv = mode + BASE + [y4m]
    single = _run(argv, str(tmp_path / "single.out"), monkeypatch)
    sharded = _run(argv, str(tmp_path / "sharded.out"), monkeypatch,
                   devices=8)
    assert single and single == sharded


def test_video_sharded_uneven_batch(y4m, tmp_path, monkeypatch):
    """8 devices, 6-frame windows: the pad-to-multiple path."""
    argv = ["-pq"] + BASE + [y4m]
    a = _run(argv, str(tmp_path / "a.out"), monkeypatch, devices=3)
    b = _run(argv, str(tmp_path / "b.out"), monkeypatch)
    assert a and a == b


def test_devices_auto(y4m, tmp_path, monkeypatch):
    argv = ["-pq"] + BASE + [y4m]
    a = _run(argv, str(tmp_path / "a.out"), monkeypatch, devices="auto")
    b = _run(argv, str(tmp_path / "b.out"), monkeypatch)
    assert a and a == b


def test_animation_sharded_matches(tmp_path, monkeypatch):
    """Animated GIF (>= 2 frames) through the sharded block planes."""
    from PIL import Image
    rng = np.random.default_rng(7)
    frames = [Image.fromarray(
        rng.integers(0, 256, (24, 32, 3), dtype=np.uint8), "RGB")
        for _ in range(5)]
    gif = str(tmp_path / "a.gif")
    frames[0].save(gif, save_all=True, append_images=frames[1:],
                   duration=50, loop=1)
    argv = ["-pq", "-g40x12", "--debug-no-frame-delay", "-b", "black",
            "--loops=1", gif]
    a = _run(argv, str(tmp_path / "a.out"), monkeypatch)
    b = _run(argv, str(tmp_path / "b.out"), monkeypatch, devices=8)
    assert a and a == b


def test_4k_still_spatial_sharding_matches(tmp_path, monkeypatch):
    """VERDICT r3 #5: a single 4K still with --devices routes through
    the ('data','space') mesh (height sharded over 'space', GSPMD halo
    exchanges for the vertical taps) and stays byte-identical to the
    single-device dispatch."""
    from PIL import Image

    from timg_tpu.parallel import auto as auto_mod

    rng = np.random.default_rng(11)
    w4k, h4k = 3840, 2160
    # structured content: gradients + blocks (fast to PNG-encode,
    # non-trivial for the resize taps)
    row = np.linspace(0, 255, w4k, dtype=np.uint8)
    img = np.empty((h4k, w4k, 3), np.uint8)
    img[..., 0] = row[None, :]
    img[..., 1] = np.linspace(0, 255, h4k, dtype=np.uint8)[:, None]
    img[..., 2] = 128
    img[500:900, 1000:2800] = rng.integers(0, 256, 3, dtype=np.uint8)
    png = str(tmp_path / "4k.png")
    Image.fromarray(img, "RGB").save(png, compress_level=1)

    argv = ["-pq", "-g80x24", "--debug-no-frame-delay", "-b", "black",
            png]
    calls = []
    orig = auto_mod.spatial_shard_call

    def spy(key, fn, batch, **kw):
        out = orig(key, fn, batch, **kw)
        calls.append((key, batch.shape, out is not None))
        return out

    monkeypatch.setattr(auto_mod, "spatial_shard_call", spy)
    single = _run(argv, str(tmp_path / "single.out"), monkeypatch)
    sharded = _run(argv, str(tmp_path / "sharded.out"), monkeypatch,
                   devices=8)
    assert single and single == sharded
    # the sharded run actually took the spatial path
    assert any(used and shape[1] == h4k for _, shape, used in calls)


def test_spatial_policy_bounds():
    """Policy: small frames and batch >= devices return None (plain
    data parallelism handles those)."""
    from timg_tpu.parallel import auto as auto_mod

    small = np.zeros((1, 64, 64, 4), np.uint8)
    assert auto_mod.spatial_shard_call(("t",), lambda x: x, small) is None
