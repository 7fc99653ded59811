"""Long-form help, paged like the reference's embedded manpage
(ref src/timg-help.cc:28-45: gunzip embedded manpage into $PAGER)."""

from __future__ import annotations

import os
import subprocess
import sys

MANPAGE = """\
timg-tpu(1)                     User Commands                    timg-tpu(1)

NAME
    timg-tpu - a TPU-accelerated terminal image and video viewer

SYNOPSIS
    timg-tpu [options] <image/video> [<image/video>...]

DESCRIPTION
    timg-tpu renders images and videos in the terminal using unicode
    half/quarter blocks, sixel, kitty or iTerm2 graphics. Decoding runs
    on the host; all pixel processing (resizing, alpha composition,
    auto-cropping, block glyph selection, sixel palette quantization and
    Floyd-Steinberg dithering) runs batched on TPU via JAX/XLA.

OPTIONS
    -p <pixelation>, --pixelation=<pixelation>
        h(alf) blocks, q(uarter) blocks, k(itty), i(term2), s(ixel).
        Default: quarter blocks, or auto-detected graphics protocol.

    --grid=<cols>[x<rows>]
        Arrange images in a grid ("contact sheet").

    -C, --center        Center images horizontally.
    --title[=<fmt>]     Print a title above each image. Format
                        placeholders: %f filename, %b basename,
                        %w width, %h height, %D decoder.
    -f <filelist>       Read newline-separated image list; relative to
                        the current directory. (repeatable)
    -F <filelist>       Like -f, relative to the filelist's directory.
    -b <color>          Background color for transparency: color name,
                        '#rrggbb', 'auto' (terminal bg) or 'none'.
    -B <color>          Checkerboard second color.
    --pattern-size=<n>  Scale factor of the checkerboard pattern.
    --auto-crop[=<pre>] Trim same-color border (optional pre-crop px).
    --rotate=exif|off   EXIF orientation handling. Default: exif.
    -W, --fit-width     Fill width, allow height overflow.
    -U, --upscale[=i]   Allow upscaling (i: integer steps only).
    --clear[=every]     Clear screen before first (or every) image.
    -V                  Only use the video decoder.
    -I                  Only use image decoders.
    -w <sec>            Wait between images.
    -wr <sec>           Wait between grid rows.
    -a                  Disable antialiasing.
    -g <w>x<h>          Output geometry in character cells.
    -o <file>           Write output to file instead of stdout.
    -E                  Don't hide the cursor while showing images.
    --compress[=n]      PNG compression level for -pk / -pi.
    --threads=<n>       Decode parallelism.
    --color8            8-bit (256 color) mode for -ph / -pq.
    --version           Print version and library info.
    --verbose           Print query/stats information.

  SCROLLING
    --scroll[=<ms>]     Scroll horizontally (default delay 50 ms).
    --delta-move=<dx:dy> Scroll direction.

  ANIMATIONS AND VIDEOS
    --loops=<n>         Cycles through animation/video; -1 = forever.
                        Default: videos once, GIFs forever (unless
                        multiple files are shown).
    --frames=<n>        Only show the first n frames.
    --frame-offset=<n>  Start at this frame.
    -t <sec>            Stop after this time.

  TIMG-TPU EXTENSIONS
    --dither=<mode>     Sixel dithering: adaptive (median-cut palette,
                        default), cube (fixed 6x7x6, fastest video), or
                        libsixel (faithful libsixel quant.c pipeline).

ENVIRONMENT
    TIMG_PIXELATION             Default pixelation mode.
    TIMG_DEFAULT_TITLE          Default title format.
    TIMG_USE_UPPER_BLOCK        Use upper half block glyph.
    TIMG_FONT_WIDTH_CORRECT     Font aspect-ratio correction factor.
    TIMG_ALLOW_FRAME_SKIP       Allow frame skipping when behind.
    TIMG_SIXEL_NEWLINE_WORKAROUND  2-bit sixel cursor quirk mask.
    TIMG_TPU_COMPILE_CACHE      XLA compile cache dir (timg-tpu; empty
                                disables; ~/.cache/timg-tpu/jax).
    TIMG_TPU_FORCE_NUMPY        Force the strict CPU mirrors and pin
                                jax to the cpu backend (timg-tpu).
    TIMG_TPU_VIDEO_RGBA         Disable the raw YUV 4:2:0 video
                                transport; convert on host via sws
                                like the reference (timg-tpu).

EXIT CODES
    0 success; 1 image read error; 2 parameter error; 3 not a terminal;
    4 cannot open output; 5 filelist problem.
"""


def invoke_help_pager() -> int:
    # Shell expansion like the reference's popen("${PAGER:-less}")
    # (ref timg-help.cc:41): PAGER values with arguments ("less -FRX")
    # must work.  A pager the shell can't find exits 127; dump the
    # manpage plainly then.
    pager = os.environ.get("PAGER") or "less"
    try:
        proc = subprocess.Popen(pager, shell=True, stdin=subprocess.PIPE)
        proc.communicate(MANPAGE.encode())
        if proc.returncode == 127:
            sys.stdout.write(MANPAGE)
    except (OSError, BrokenPipeError):
        sys.stdout.write(MANPAGE)
    return 0
