"""Device-side pixel kernels (JAX/XLA/Pallas).

Everything post-decode in the reference's data plane lives here as pure,
batched, jit-compilable functions over uint8 RGBA frame tensors
``[B, H, W, 4]``:

  resize.py   -- separable filter resampling (ref: src/image-scaler.cc +
                 third_party/stb/stb_image_resize2.h tap semantics)
  compose.py  -- linear-space alpha composition / checkerboard
                 (ref: src/framebuffer.cc:108-150, framebuffer.h:138-200)
  blocks.py   -- half/quarter unicode-block glyph+color selection
                 (ref: src/unicode-block-canvas.cc:154-227)
  autocrop.py -- uniform-border detection (ref behavior:
                 Magick::Image::trim(), graphics-magick-source.cc:231-241)
  sixel.py    -- 256-color quantization + Floyd-Steinberg dithering
                 (ref behavior: libsixel via src/sixel-canvas.cc:134-148)
"""
