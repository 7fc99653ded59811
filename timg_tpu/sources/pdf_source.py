"""PDF source (gated).

The reference renders PDFs through poppler-glib + cairo
(ref src/pdf-image-source.cc), compiled in only under
WITH_TIMG_POPPLER (ref CMakeLists.txt). This environment ships only the
core C++ libpoppler (no glib C API), which cannot be bound via ctypes,
so the source is gated exactly like a reference build configured
without poppler: it reports a clear error instead of silently failing.
"""

from __future__ import annotations

from timg_tpu.options import DisplayOptions
from timg_tpu.sources.base import ImageSource


def poppler_available() -> bool:
    import ctypes
    try:
        ctypes.CDLL("libpoppler-glib.so.8")
        return True
    except OSError:
        return False


class PDFSource(ImageSource):
    def __init__(self, filename: str):
        super().__init__(filename)
        self.decoder_name = "pdf"

    def load_and_scale(self, options: DisplayOptions, frame_offset: int,
                       frame_count: int) -> bool:
        if not self.filename.lower().endswith(".pdf"):
            return False
        if not poppler_available():
            raise RuntimeError(
                f"{self.filename}: PDF support needs poppler-glib, which "
                "is not available (like a timg build without "
                "WITH_POPPLER)")
        # poppler-glib binding would go here (render page range
        # frame_offset..frame_offset+frame_count to cairo surfaces,
        # white background, like pdf-image-source.cc:57-141).
        return False
