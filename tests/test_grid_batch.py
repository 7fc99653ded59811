"""Cross-image grid batching (sources/batch.py; VERDICT r2 #5).

Same-geometry contact-sheet cells must share one resize dispatch with
byte-identical output vs the unbatched path (SURVEY §2.4: "a 4x2 grid
is one batched kernel launch").
"""

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from tests.test_golden import run_ours


@pytest.fixture(scope="module")
def jpegs():
    """8 same-size JPEGs (BASELINE config #2's shape class)."""
    d = tempfile.mkdtemp(prefix="timg_grid_")
    rng = np.random.default_rng(12)
    paths = []
    for i in range(8):
        p = os.path.join(d, f"img{i}.jpg")
        Image.fromarray(rng.integers(0, 256, (120, 160, 3),
                                     dtype=np.uint8)).save(p, quality=90)
        paths.append(p)
    return paths


GRID_ARGS = ["--debug-no-frame-delay", "-g80x24", "-b", "black",
             "--grid=4x2", "--title", "-pq"]


def _run(args, files, batched: bool) -> bytes:
    if batched:
        os.environ.pop("TIMG_TPU_NO_GRID_BATCH", None)
        return run_ours(args, files)
    os.environ["TIMG_TPU_NO_GRID_BATCH"] = "1"
    try:
        return run_ours(args, files)
    finally:
        os.environ.pop("TIMG_TPU_NO_GRID_BATCH", None)


def test_grid_batched_matches_unbatched(jpegs):
    a = _run(GRID_ARGS, jpegs, batched=True)
    b = _run(GRID_ARGS, jpegs, batched=False)
    assert a and a == b


def test_grid_batched_sixel_matches(jpegs):
    args = ["--debug-no-frame-delay", "-g80x24", "-b", "black",
            "--grid=2", "-ps", "--dither=adaptive"]
    files = jpegs[:4]
    a = _run(args, files, batched=True)
    b = _run(args, files, batched=False)
    assert a and a == b


def test_grid_batched_libsixel_matches(jpegs):
    args = ["--debug-no-frame-delay", "-g80x24", "-b", "black",
            "--grid=2", "-ps"]
    files = jpegs[:4]
    a = _run(args, files, batched=True)
    b = _run(args, files, batched=False)
    assert a and a == b


def test_grid_single_resize_dispatch(jpegs, monkeypatch):
    """All 8 same-geometry cells resolve through ONE resize call."""
    from timg_tpu.ops import resize_np

    calls = []
    orig = resize_np.resize_batch_np

    def counting(frames, out_h, out_w, *a, **k):
        calls.append(frames.shape)
        return orig(frames, out_h, out_w, *a, **k)

    monkeypatch.setattr(resize_np, "resize_batch_np", counting)
    out = _run(GRID_ARGS, jpegs, batched=True)
    assert out
    assert len(calls) == 1, calls
    assert calls[0][0] == 8  # whole grid in one batch


def test_grid_mixed_sizes_two_groups(jpegs, monkeypatch, tmp_path):
    """Different input geometries bucket into separate dispatches and
    stay byte-identical to the unbatched run."""
    rng = np.random.default_rng(3)
    odd = []
    for i in range(4):
        p = str(tmp_path / f"odd{i}.png")
        Image.fromarray(rng.integers(0, 256, (90, 70, 3),
                                     dtype=np.uint8)).save(p)
        odd.append(p)
    files = jpegs[:4] + odd
    from timg_tpu.ops import resize_np

    calls = []
    orig = resize_np.resize_batch_np

    def counting(frames, out_h, out_w, *a, **k):
        calls.append(frames.shape)
        return orig(frames, out_h, out_w, *a, **k)

    monkeypatch.setattr(resize_np, "resize_batch_np", counting)
    a = _run(GRID_ARGS, files, batched=True)
    assert len(calls) == 2, calls
    monkeypatch.setattr(resize_np, "resize_batch_np", orig)
    b = _run(GRID_ARGS, files, batched=False)
    assert a and a == b


def test_grid_with_missing_file_no_hang(jpegs, tmp_path):
    """A failing cell still lets the collector flush (arrive() counts
    every decode task); output matches the unbatched run."""
    files = jpegs[:3] + [str(tmp_path / "nope.jpg")] + jpegs[3:6]
    a = _run(GRID_ARGS, files, batched=True)
    b = _run(GRID_ARGS, files, batched=False)
    assert a and a == b


def test_grid_reference_parity_still_holds(jpegs):
    """Grid + title byte parity vs the reference binary is already
    asserted by the golden suite for PNGs; this pins that the batched
    path is active there too (PNG grid, batched == unbatched)."""
    rng = np.random.default_rng(9)
    d = tempfile.mkdtemp(prefix="timg_gridpng_")
    pngs = []
    for i in range(4):
        p = os.path.join(d, f"g{i}.png")
        Image.fromarray(rng.integers(0, 256, (60, 80, 3),
                                     dtype=np.uint8)).save(p)
        pngs.append(p)
    args = ["--debug-no-frame-delay", "-g60x20", "-b", "black",
            "--grid=2", "--title", "-ph"]
    a = _run(args, pngs, batched=True)
    b = _run(args, pngs, batched=False)
    assert a and a == b
