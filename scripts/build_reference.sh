#!/bin/sh
# Build the minimal-feature reference binary and the stb resize oracle used
# by the parity test suite (tests/test_golden*.py, tests/test_ops.py).
#
# Build artifacts land in /root/repo/.refbuild (gitignored); re-run this
# script after an environment reset. The minimal feature set matches
# BASELINE.md: stb decode + stb resize only (GraphicsMagick / libsixel /
# libav are not present in this container).
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
REF=/root/reference
BUILD="$REPO/.refbuild"

mkdir -p "$BUILD"

cmake -S "$REF" -B "$BUILD" -G Ninja \
    -DCMAKE_BUILD_TYPE=Release \
    -DWITH_VIDEO_DECODING=Off -DWITH_VIDEO_DEVICE=Off \
    -DWITH_GRAPHICSMAGICK=Off -DWITH_TURBOJPEG=Off \
    -DWITH_RSVG=Off -DWITH_POPPLER=Off -DWITH_LIBSIXEL=Off \
    -DWITH_QOI_IMAGE=On -DWITH_STB_IMAGE=On \
    -DTIMG_VERSION_FROM_GIT=Off >/dev/null
ninja -C "$BUILD" timg >/dev/null

# stb oracle: raw RGBA8 on stdin -> stb_image_resize2 (the reference's
# resize when built without swscale; see reference src/image-scaler.cc:74-98)
# -> raw RGBA8 on stdout. argv: in_w in_h out_w out_h.
cat > "$BUILD/stb_oracle.c" <<'EOF'
#include <stdio.h>
#include <stdlib.h>
#define STB_IMAGE_RESIZE_IMPLEMENTATION
/* Match the reference's compile-time filter choice
   (reference src/image-scaler.cc:29-32). */
#define STBIR_DEFAULT_FILTER_UPSAMPLE STBIR_FILTER_BOX
#include "third_party/stb/stb_image_resize2.h"

/* Mirror reference image-scaler.cc STBImageScaler::Scale (:84-92):
   stbir_resize_init + RGBA layouts + stbir_resize_extended. */
int main(int argc, char **argv) {
    if (argc != 5) return 2;
    int iw = atoi(argv[1]), ih = atoi(argv[2]);
    int ow = atoi(argv[3]), oh = atoi(argv[4]);
    size_t in_len = (size_t)iw * ih * 4, out_len = (size_t)ow * oh * 4;
    unsigned char *in = malloc(in_len), *out = malloc(out_len);
    if (fread(in, 1, in_len, stdin) != in_len) return 3;
    STBIR_RESIZE resize;
    stbir_resize_init(&resize, in, iw, ih, 0, out, ow, oh, 0,
                      STBIR_RGBA, STBIR_TYPE_UINT8);
    stbir_set_pixel_layouts(&resize, STBIR_RGBA, STBIR_RGBA);
    stbir_resize_extended(&resize);
    fwrite(out, 1, out_len, stdout);
    return 0;
}
EOF
gcc -O2 -I"$REF" -o "$BUILD/stb_oracle" "$BUILD/stb_oracle.c" -lm

echo "built: $BUILD/src/timg, $BUILD/stb_oracle"
