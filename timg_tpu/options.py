"""Session configuration structs.

Behavioral contract follows the reference's two plain config structs:
``DisplayOptions`` (per-image processing; ref: src/display-options.h:34-105)
and ``PresentationOptions`` (session arrangement; ref: src/timg.cc:127-146).
Config flows as plain data; no registry, no config files.
"""

from __future__ import annotations

import enum
import os
from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

# Sentinel for a not-initialized command-line value
# (ref: src/display-options.h:30).
NOT_INITIALIZED = -(2**31)

RGBA = Tuple[int, int, int, int]  # r, g, b, a in 0..255; a: 0=transparent
TRANSPARENT: RGBA = (0, 0, 0, 0)


class Pixelation(enum.Enum):
    """Output protocol choice (ref: src/timg.cc:108-117)."""

    NOT_CHOSEN = "not-chosen"
    HALF_BLOCK = "half"
    QUARTER_BLOCK = "quarter"
    KITTY = "kitty"
    ITERM2 = "iterm2"
    SIXEL = "sixel"


class ClearScreen(enum.Enum):
    """When to clear the draw area (ref: src/timg.cc:119-123)."""

    NOT = 0
    BEFORE_FIRST_IMAGE = 1
    BEFORE_EACH_IMAGE = 2


def is_pixel_direct(p: Pixelation) -> bool:
    """Protocols that transfer high-res pixels (ref: src/timg.cc:465-472)."""
    return p in (Pixelation.KITTY, Pixelation.ITERM2, Pixelation.SIXEL)


def is_pixel_direct_with_alpha(p: Pixelation) -> bool:
    """Protocols with terminal-side alpha blending (ref: src/timg.cc:461-464)."""
    return p in (Pixelation.KITTY, Pixelation.ITERM2)


@dataclass
class SixelOptions:
    """Per-terminal sixel quirks (ref: src/term-query.h:46-49)."""

    known_broken_cursor_placement: bool = False
    full_cell_jump: bool = False


@dataclass
class DisplayOptions:
    """Options influencing per-image processing.

    Field-for-field behavioral parity with ref src/display-options.h:34-105.
    ``bgcolor_getter`` is a callable for asynchronous background queries.
    """

    width: int = -1   # Output size in *pixels* (not cells).
    height: int = -1

    cell_x_px: int = 1  # Pixels shown in one character cell.
    cell_y_px: int = 2

    compress_pixel_level: int = 1  # PNG deflate level for kitty/iterm2.

    width_stretch: float = 1.0  # Font aspect-ratio correction.

    upscale: bool = False
    upscale_integer: bool = False
    fill_width: bool = False
    fill_height: bool = False
    antialias: bool = True
    center_horizontally: bool = False
    crop_border: int = 0
    auto_crop: bool = False
    exif_rotate: bool = True
    show_title: bool = False

    # Title format: %f filename, %b basename, %w width, %h height, %D decoder.
    title_format: str = "%f"

    # Scrolling
    scroll_animation: bool = False
    scroll_dx: int = 1
    scroll_dy: int = 0
    scroll_delay_ms: float = 50.0

    allow_frame_skipping: bool = False

    # Background for transparency. Returns solid color to blend, or
    # alpha=0 to indicate no blending (ref: display-options.h:84-97).
    local_alpha_handling: bool = True
    bgcolor_getter: Optional[Callable[[], RGBA]] = None
    bg_pattern_color: RGBA = TRANSPARENT
    pattern_size: int = 1

    # Session renders sixel ("cube" | "adaptive"): sources prime
    # batched dither planes for animation/video windows (timg-tpu
    # extension; None for non-sixel sessions).
    sixel_batch_dither: Optional[str] = None

    def __post_init__(self) -> None:
        # Env-var default for the title format (ref: display-options.h:35-38).
        env_fmt = os.environ.get("TIMG_DEFAULT_TITLE")
        if env_fmt and self.title_format == "%f":
            self.title_format = env_fmt


@dataclass
class PresentationOptions:
    """Options configuring how images/videos are arranged and presented
    (ref: src/timg.cc:127-146)."""

    pixelation: Pixelation = Pixelation.NOT_CHOSEN
    sixel_options: SixelOptions = field(default_factory=SixelOptions)
    # timg-tpu extension: adaptive | cube | libsixel (reference-exact)
    sixel_dither: str = "adaptive"
    tmux_workaround: bool = False
    terminal_use_upper_block: bool = False
    use_256_color: bool = False

    grid_cols: int = 1
    grid_rows: int = 1

    duration_per_image_ms: float = float("inf")
    loops: int = NOT_INITIALIZED
    hide_cursor: bool = True
    clear_screen: ClearScreen = ClearScreen.NOT
    duration_between_images_ms: float = 0.0
    duration_for_row_ms: float = 0.0
