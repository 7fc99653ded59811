"""timg-tpu: a TPU-native terminal image & video viewer framework.

A from-scratch rebuild of the capabilities of hzeller/timg with the
post-decode pixel pipeline (resize, alpha composition, auto-crop,
unicode-block glyph selection, sixel palette quantization + dithering)
expressed as batched JAX/XLA/Pallas programs, and the surrounding runtime
(decoders, terminal protocol emission, pacing, grid layout, CLI) on host.

Layer map (mirrors reference layer inventory, re-architected TPU-first):

  cli.py            -- flag surface & session orchestration (ref: src/timg.cc)
  options.py        -- DisplayOptions / PresentationOptions (ref: src/display-options.h)
  geometry.py       -- scale-to-fit math (ref: src/image-source.cc:47-153)
  colors.py         -- color parsing / 256-color cube (ref: src/framebuffer.h:26-60)
  term.py           -- terminal introspection (ref: src/term-query.{h,cc})
  sources/          -- host-side decoders (ref: src/*-source.cc)
  ops/              -- device pixel kernels (ref: framebuffer.cc, image-scaler.cc,
                       unicode-block-canvas.cc glyph math, sixel quantization)
  render/           -- escape-stream assembly, layout, pacing (ref: renderer.cc,
                       terminal-canvas.cc, buffered-write-sequencer.cc,
                       kitty-canvas.cc, iterm2-canvas.cc, sixel-canvas.cc)
  parallel/         -- device-mesh sharding of frame batches (TPU-native; the
                       reference is single-machine CPU with thread pools)
  native/           -- C++ runtime pieces (ANSI emitter, PNG/deflate, base64,
                       video decode) loaded via ctypes
"""

__version__ = "0.1.0"

from timg_tpu.options import DisplayOptions, PresentationOptions  # noqa: F401
