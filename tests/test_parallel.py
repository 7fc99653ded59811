"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

from __future__ import annotations

import numpy as np
import pytest


def test_mesh_shapes():
    import jax

    from timg_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "space")


def test_dryrun_multichip():
    import jax

    import __graft_entry__ as graft

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    graft.dryrun_multichip(8)
    graft.dryrun_multichip(4)


def test_sharded_matches_single_device():
    """The sharded pipeline must produce the same planes as unsharded."""
    import jax
    import jax.numpy as jnp

    from timg_tpu.ops import pipeline
    from timg_tpu.parallel.mesh import make_mesh, sharded_quarter_pipeline

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    space = mesh.devices.shape[1]
    out_h, out_w = 16 * space, 32
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (mesh.devices.shape[0] * 2, 24 * space,
                                   48, 4), dtype=np.uint8)
    fn = sharded_quarter_pipeline(mesh, out_h, out_w)
    with mesh:
        g1, f1, b1 = (np.asarray(p) for p in fn(jnp.asarray(frames)))
    g2, f2, b2 = (np.asarray(p) for p in pipeline.quarter_pipeline(
        jnp.asarray(frames), out_h, out_w, bg_color=(0, 0, 0, 255)))
    assert np.array_equal(g1, g2)
    assert np.array_equal(f1, f2)
    assert np.array_equal(b1, b2)


def test_sharded_video_sixel_matches_single():
    """Data-sharded video sixel pipeline == single-device result."""
    import jax
    import jax.numpy as jnp

    from timg_tpu.ops.sixel import fs_dither_cube
    from timg_tpu.ops.resize import resize_video_words
    from timg_tpu.parallel.mesh import make_mesh, sharded_video_sixel_pipeline

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh8 = make_mesh(8, data=8)

    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (8, 48, 64, 4), dtype=np.uint8)
    frames[..., 3] = 255
    words = jax.lax.bitcast_convert_type(jnp.asarray(frames), jnp.int32)

    fn = sharded_video_sixel_pipeline(mesh8, 24, 32)
    with mesh8:
        got = np.asarray(fn(words))

    resized = resize_video_words(words, 24, 32)
    want = np.asarray(fs_dither_cube(
        jax.lax.bitcast_convert_type(resized, jnp.uint8))).astype(np.uint8)
    assert got.shape == want.shape == (8, 24, 32)
    assert np.array_equal(got, want)
