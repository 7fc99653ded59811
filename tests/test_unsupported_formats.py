"""Unsupported-format diagnostics (VERDICT r3 #10).

The reference gets DPX/XCF/MIFF/... for free from GraphicsMagick's
coder registry (ref graphics-magick-source.cc:156-282); this build has
no decoder for them.  The error path must name the format and exit 1
cleanly (ref image-source.cc:223-260 is the factory's error-reporting
analog), not crash or fail with a silent generic error.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

# r5 note: .dpx/.cin/.xwd/.miff/.xcf/.rla left this list -- they decode natively
# now (sources/gm_formats.py, tests/test_gm_formats.py); broken files
# with those suffixes are reference-silent like any supported format.
GM_ONLY = [".pict", ".viff", ".sct", ".mvg", ".otb"]


@pytest.mark.parametrize("ext", GM_ONLY)
def test_named_diagnostic_and_exit_1(ext, tmp_path):
    path = tmp_path / f"sample{ext}"
    # plausible-but-undecodable bytes (magic-free; every prober bails)
    path.write_bytes(b"\x01\x02GARBAGE" + bytes(64))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("TIMG_")}
    r = subprocess.run(
        [sys.executable, "-m", "timg_tpu.cli", "-g20x10", "-pq",
         "-b", "black", "-o", os.devnull, str(path)],
        env=env, capture_output=True, timeout=120, cwd="/root/repo")
    assert r.returncode == 1
    err = r.stderr.decode()
    assert ext[1:].upper() in err, err
    assert "not supported" in err, err


def test_pil_decodable_suffix_stays_silent(tmp_path):
    """A broken file with a PIL-supported suffix keeps the reference's
    silent-failure semantics (exit 1, no invented diagnostic)."""
    path = tmp_path / "broken.pcx"
    path.write_bytes(b"\x01\x02GARBAGE" + bytes(64))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("TIMG_")}
    r = subprocess.run(
        [sys.executable, "-m", "timg_tpu.cli", "-g20x10", "-pq",
         "-b", "black", "-o", os.devnull, str(path)],
        env=env, capture_output=True, timeout=120, cwd="/root/repo")
    assert r.returncode == 1
    assert "not supported" not in r.stderr.decode()


def test_in_process_factory_diagnostic(tmp_path):
    from timg_tpu.options import DisplayOptions
    from timg_tpu.sources.base import create_source

    path = tmp_path / "x.pict"
    path.write_bytes(bytes(32))
    opts = DisplayOptions()
    opts.width, opts.height = 20, 20
    src, err = create_source(str(path), opts)
    assert src is None
    assert "PICT is not supported" in err
