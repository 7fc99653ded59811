"""Host-side decode sources.

The reference's decode tier stays on host (it is file/byte oriented):
ref src/image-source.{h,cc} factory + 8 concrete sources. Here:

  base.py        -- ImageSource interface, frame container, factory,
                    title formatting, APNG sniffing
  pil_source.py  -- Pillow-backed generalist decoder (PNG/JPEG/GIF/WebP/
                    BMP/...), covering the reference's stb/turbojpeg/
                    GraphicsMagick image roles
  qoi_source.py  -- QOI decoder (ref: third_party/qoi behavior)
  video_source.py-- libav-backed video decode via the native helper
"""

from timg_tpu.sources.base import ImageSource, create_source  # noqa: F401
