/* Minimal mock of the libopenslide C ABI for slide-source tests.
 *
 * libopenslide is absent in this environment; this .so implements the
 * nine functions timg_tpu/sources/openslide_source.py binds, with a
 * deterministic 3-level pyramid so the level-selection, read_region,
 * thumbnail-preference and ARGB-unpremultiply paths run for real:
 *
 *   - a "slide" opens iff the file exists and starts with "MOCKSLIDE";
 *     a file starting with "BADSLIDE" opens but reports an error
 *     (exercises openslide_get_error gating)
 *   - levels: 0 = 4000x2000, 1 = 1000x500, 2 = 250x125
 *   - best_level_for_downsample: largest level whose downsample
 *     (4000/w) is <= requested (the real library's semantics)
 *   - read_region fills premultiplied ARGB words encoding the level in
 *     the red channel (level*60), with a green x-gradient
 *   - associated image "thumbnail": 300x150, blue=200 marker,
 *     half-alpha right half (premultiplied) to exercise unpremultiply
 *
 * Built on demand by tests/test_openslide.py:
 *   gcc -shared -fPIC -o libopenslide_mock.so mock_openslide.c
 * selected via TIMG_OPENSLIDE_LIB.
 */

#include <stdint.h>
#include <stdio.h>
#include <string.h>

static int mock_slide = 1;
static int bad_slide = 2;

static const int64_t kLevelW[3] = {4000, 1000, 250};
static const int64_t kLevelH[3] = {2000, 500, 125};

void *openslide_open(const char *filename) {
    FILE *f = fopen(filename, "rb");
    if (!f) return 0;
    char magic[9] = {0};
    size_t n = fread(magic, 1, 9, f);
    fclose(f);
    if (n == 9 && memcmp(magic, "MOCKSLIDE", 9) == 0) return &mock_slide;
    if (n == 9 && memcmp(magic, "BADSLIDE", 8) == 0) return &bad_slide;
    return 0;
}

const char *openslide_get_error(void *osr) {
    return osr == &bad_slide ? "mock: corrupt slide" : 0;
}

void openslide_close(void *osr) { (void)osr; }

int32_t openslide_get_level_count(void *osr) {
    (void)osr;
    return 3;
}

void openslide_get_level_dimensions(void *osr, int32_t level, int64_t *w,
                                    int64_t *h) {
    (void)osr;
    if (level < 0 || level > 2) {
        *w = -1;
        *h = -1;
        return;
    }
    *w = kLevelW[level];
    *h = kLevelH[level];
}

int32_t openslide_get_best_level_for_downsample(void *osr, double ds) {
    (void)osr;
    int32_t best = 0;
    for (int32_t i = 0; i < 3; ++i) {
        double level_ds = (double)kLevelW[0] / kLevelW[i];
        if (level_ds <= ds) best = i;
    }
    return best;
}

void openslide_read_region(void *osr, uint32_t *dest, int64_t x, int64_t y,
                           int32_t level, int64_t w, int64_t h) {
    (void)osr;
    (void)x;
    (void)y;
    uint32_t red = (uint32_t)(60 * level);
    for (int64_t yy = 0; yy < h; ++yy)
        for (int64_t xx = 0; xx < w; ++xx) {
            uint32_t green = (uint32_t)(xx * 255 / (w > 1 ? w - 1 : 1));
            dest[yy * w + xx] =
                0xFFu << 24 | red << 16 | green << 8 | 0x10u;
        }
}

static const char *kAssociated[] = {"label", "thumbnail", 0};

const char *const *openslide_get_associated_image_names(void *osr) {
    (void)osr;
    return kAssociated;
}

void openslide_get_associated_image_dimensions(void *osr, const char *name,
                                               int64_t *w, int64_t *h) {
    (void)osr;
    if (strcmp(name, "thumbnail") == 0) {
        *w = 300;
        *h = 150;
    } else {
        *w = 40;
        *h = 20;
    }
}

void openslide_read_associated_image(void *osr, const char *name,
                                     uint32_t *dest) {
    (void)osr;
    if (strcmp(name, "thumbnail") != 0) return;
    for (int64_t yy = 0; yy < 150; ++yy)
        for (int64_t xx = 0; xx < 300; ++xx) {
            if (xx < 150) {  /* opaque: blue=200 marker */
                dest[yy * 300 + xx] = 0xFFu << 24 | 0xC8u;
            } else {         /* premultiplied half-alpha white */
                dest[yy * 300 + xx] =
                    0x80u << 24 | 0x80u << 16 | 0x80u << 8 | 0x80u;
            }
        }
}
