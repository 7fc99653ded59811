// Native runtime pieces for timg-tpu, exposed as a C ABI for ctypes.
//
// 1. Video decoding via libav (role of ref src/video-source.cc): demux +
//    frame-threaded decode + pixel-format conversion to RGBA at native
//    resolution. Scaling happens on the TPU (ops/resize.py), unlike the
//    reference which scales on host with sws; sws here only converts
//    YUV->RGBA.
// 2. ANSI block-stream assembly (role of ref
//    src/unicode-block-canvas.cc:229-321 AppendDoubleRow): turns the
//    device-computed (glyph, fg, bg) planes into the escape byte stream
//    with run-length color elision and inter-frame diff skips. Kept
//    byte-compatible with the Python emitter (render/ansi.py), which is
//    the reference-parity-tested implementation.
//
// Build: make -C timg_tpu/native  (links libavformat/avcodec/avutil/
// swscale present on the system).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <thread>
#include <cstdlib>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

// ---------------------------------------------------------------------------
// Video decode
// ---------------------------------------------------------------------------

namespace {

void dummy_log(void *, int, const char *, va_list) {}

struct VideoHandle {
    AVFormatContext *format = nullptr;
    AVCodecContext *codec = nullptr;
    SwsContext *sws = nullptr;
    AVFrame *frame = nullptr;
    AVPacket *packet = nullptr;
    int stream_index = -1;
    int width = 0, height = 0;
    double fps = 0.0;
    bool draining = false;
};

bool init_sws(VideoHandle *v) {
    // YUVJ -> YUV pixel format range fix (behavior of ref
    // video-source.cc:59-89: deprecated J formats carry full range).
    AVPixelFormat pix = v->codec->pix_fmt;
    bool full_range = false;
    switch (pix) {
    case AV_PIX_FMT_YUVJ420P: pix = AV_PIX_FMT_YUV420P; full_range = true; break;
    case AV_PIX_FMT_YUVJ422P: pix = AV_PIX_FMT_YUV422P; full_range = true; break;
    case AV_PIX_FMT_YUVJ444P: pix = AV_PIX_FMT_YUV444P; full_range = true; break;
    case AV_PIX_FMT_YUVJ440P: pix = AV_PIX_FMT_YUV440P; full_range = true; break;
    default: break;
    }
    v->sws = sws_getContext(v->width, v->height, pix, v->width, v->height,
                            AV_PIX_FMT_RGBA, SWS_BILINEAR, nullptr, nullptr,
                            nullptr);
    if (!v->sws) return false;
    if (full_range) {
        int *inv_table, *table, in_full, out_full, brightness, contrast, sat;
        if (sws_getColorspaceDetails(v->sws, &inv_table, &in_full, &table,
                                     &out_full, &brightness, &contrast,
                                     &sat) != -1) {
            sws_setColorspaceDetails(v->sws, inv_table, 1, table, out_full,
                                     brightness, contrast, sat);
        }
    }
    return true;
}

}  // namespace

extern "C" {

void *timg_video_open(const char *filename) {
    static bool initialized = false;
    if (!initialized) {
        avformat_network_init();
        av_log_set_callback(dummy_log);
        initialized = true;
    }
    VideoHandle *v = new VideoHandle();
    if (avformat_open_input(&v->format, filename, nullptr, nullptr) != 0) {
        delete v;
        return nullptr;
    }
    if (avformat_find_stream_info(v->format, nullptr) < 0) goto fail;

    {
        const AVCodec *decoder = nullptr;
        for (unsigned i = 0; i < v->format->nb_streams; ++i) {
            AVCodecParameters *par = v->format->streams[i]->codecpar;
            const AVCodec *c = avcodec_find_decoder(par->codec_id);
            if (c && par->codec_type == AVMEDIA_TYPE_VIDEO) {
                v->stream_index = (int)i;
                decoder = c;
                break;
            }
        }
        if (!decoder || v->stream_index < 0) goto fail;

        AVStream *stream = v->format->streams[v->stream_index];
        AVRational rate = av_guess_frame_rate(v->format, stream, nullptr);
        v->fps = rate.den ? (double)rate.num / rate.den : 25.0;

        v->codec = avcodec_alloc_context3(decoder);
        // Frame-threaded decode, <=4 threads (ref video-source.cc:194-199).
        if (decoder->capabilities & AV_CODEC_CAP_FRAME_THREADS &&
            std::thread::hardware_concurrency() > 1) {
            v->codec->thread_type = FF_THREAD_FRAME;
            v->codec->thread_count =
                std::min(4u, std::thread::hardware_concurrency());
        }
        if (avcodec_parameters_to_context(v->codec, stream->codecpar) < 0)
            goto fail;
        if (avcodec_open2(v->codec, decoder, nullptr) < 0 ||
            v->codec->width <= 0 || v->codec->height <= 0)
            goto fail;
        v->width = v->codec->width;
        v->height = v->codec->height;
        if (!init_sws(v)) goto fail;
        v->frame = av_frame_alloc();
        v->packet = av_packet_alloc();
    }
    return v;

fail:
    if (v->codec) avcodec_free_context(&v->codec);
    if (v->format) avformat_close_input(&v->format);
    delete v;
    return nullptr;
}

void timg_video_info(void *handle, int *width, int *height, double *fps) {
    VideoHandle *v = (VideoHandle *)handle;
    *width = v->width;
    *height = v->height;
    *fps = v->fps;
}

// Returns 1 on frame decoded into rgba_out (width*height*4 bytes),
// 0 on end of stream, -1 on error. Read/drain state machine
// (behavior of ref video-source.cc:313-365).
int timg_video_read_frame(void *handle, uint8_t *rgba_out) {
    VideoHandle *v = (VideoHandle *)handle;
    for (;;) {
        int ret = avcodec_receive_frame(v->codec, v->frame);
        if (ret == 0) {
            uint8_t *dst[1] = {rgba_out};
            int dst_stride[1] = {v->width * 4};
            sws_scale(v->sws, v->frame->data, v->frame->linesize, 0,
                      v->height, dst, dst_stride);
            av_frame_unref(v->frame);
            return 1;
        }
        if (ret == AVERROR_EOF) return 0;
        if (ret != AVERROR(EAGAIN)) return -1;
        if (v->draining) return 0;

        // feed more packets
        for (;;) {
            ret = av_read_frame(v->format, v->packet);
            if (ret < 0) {
                v->draining = true;
                avcodec_send_packet(v->codec, nullptr);  // start drain
                break;
            }
            if (v->packet->stream_index == v->stream_index) {
                ret = avcodec_send_packet(v->codec, v->packet);
                av_packet_unref(v->packet);
                if (ret < 0 && ret != AVERROR(EAGAIN)) return -1;
                break;
            }
            av_packet_unref(v->packet);
        }
    }
}

// Rewind for looping (ref video-source.cc:302-307).
int timg_video_rewind(void *handle) {
    VideoHandle *v = (VideoHandle *)handle;
    if (av_seek_frame(v->format, v->stream_index, 0,
                      AVSEEK_FLAG_BACKWARD) < 0)
        return 0;
    avcodec_flush_buffers(v->codec);
    v->draining = false;
    return 1;
}

void timg_video_close(void *handle) {
    VideoHandle *v = (VideoHandle *)handle;
    if (v->packet) av_packet_free(&v->packet);
    if (v->frame) av_frame_free(&v->frame);
    if (v->sws) sws_freeContext(v->sws);
    if (v->codec) avcodec_free_context(&v->codec);
    if (v->format) avformat_close_input(&v->format);
    delete v;
}

const char *timg_video_version() {
    static char buf[64];
    snprintf(buf, sizeof(buf), "libavformat %d.%d.%d",
             LIBAVFORMAT_VERSION_MAJOR, LIBAVFORMAT_VERSION_MINOR,
             LIBAVFORMAT_VERSION_MICRO);
    return buf;
}

// ---------------------------------------------------------------------------
// ANSI block-stream assembly (glyph/fg/bg planes -> escape bytes)
// ---------------------------------------------------------------------------

namespace {

const char *const kGlyphs[9] = {" ", "▘", "▝", "▖",
                                "▗", "▌", "▚", "▄",
                                "▀"};

inline char *append_str(char *pos, const char *s) {
    size_t n = strlen(s);
    memcpy(pos, s, n);
    return pos + n;
}

inline char *append_dec(char *pos, int v) {
    return pos + sprintf(pos, "%d", v);
}

// "ddd;" 4-byte-chunk lookup for uint8 components: one memcpy instead
// of a sprintf per component (role of the 64-byte-aligned LUT in ref
// unicode-block-canvas.cc:449-491; sprintf was ~30 ms/frame).
struct DecEntry {
    char s[4];
    uint8_t len;
};
struct DecTable {
    DecEntry e[256];
    DecTable() {
        for (int v = 0; v < 256; ++v) {
            int n = snprintf(e[v].s, 4, "%d", v);
            e[v].s[n] = ';';
            e[v].len = (uint8_t)(n + 1);
        }
    }
};
inline char *append_u8_semi(char *pos, uint8_t v) {
    static const DecTable t;  // magic static: thread-safe init
    memcpy(pos, t.e[v].s, 4);
    return pos + t.e[v].len;
}

inline int as_256_term_color(int r, int g, int b) {
    // xterm 6x6x6 cube / gray ramp (parity with timg_tpu.colors).
    if (r == g && g == b) return 232 + (r * 23 / 255);
    auto v2cube = [](int v) {
        return v < 0x5f / 2            ? 0
               : v < (0x5f + 0x87) / 2 ? 1
               : v < (0x87 + 0xaf) / 2 ? 2
               : v < (0xaf + 0xd7) / 2 ? 3
               : v < (0xd7 + 0xff) / 2 ? 4
                                       : 5;
    };
    return 16 + 36 * v2cube(r) + 6 * v2cube(g) + v2cube(b);
}

inline char *append_color(char *pos, const uint8_t *c, bool use_256) {
    if (use_256) {
        pos = append_u8_semi(pos, (uint8_t)as_256_term_color(
            c[0], c[1], c[2]));
    } else {
        pos = append_u8_semi(pos, c[0]);
        pos = append_u8_semi(pos, c[1]);
        pos = append_u8_semi(pos, c[2]);
    }
    return pos;
}

}  // namespace

// ---------------------------------------------------------------------------
// Sixel stream assembly (index plane + palette -> DCS payload)
// (role of the byte-assembly half of ref src/sixel-canvas.cc /
//  libsixel's encoder; quantization+dithering run on the TPU)
// ---------------------------------------------------------------------------

namespace {

inline char *append_dec_fast(char *pos, int v) {
    // manual itoa: the RLE loop calls this ~100k times per random
    // frame; sprintf here cost ~60 ms/frame
    if (v < 10) { *pos++ = (char)('0' + v); return pos; }
    char tmp[12];
    int n = 0;
    while (v) { tmp[n++] = (char)('0' + v % 10); v /= 10; }
    while (n) *pos++ = tmp[--n];
    return pos;
}

inline char *append_sixel_runs(char *pos, const uint8_t *bits, int w) {
    // RLE one color's band row: '?'+bitmask chars, '!<n>' for runs > 3.
    // Runs are detected with 8-byte word compares: per-color masks are
    // mostly long equal stretches (zeros for sparse colors), and the
    // byte loop was the assembler's hot spot.
    int i = 0;
    while (i < w) {
        const uint8_t c = bits[i];
        const uint64_t pat = 0x0101010101010101ull * c;
        int run = 1;
        while (i + run + 8 <= w) {
            uint64_t v;
            memcpy(&v, bits + i + run, 8);
            if (v != pat) break;
            run += 8;
        }
        while (i + run < w && bits[i + run] == c) ++run;
        if (c == 0 && i + run == w) break;  // trailing blanks omitted
        const char ch = (char)(0x3F + c);
        if (run > 3) {
            *pos++ = '!';
            pos = append_dec_fast(pos, run);
            *pos++ = ch;
        } else {
            // branchless splat: write 3, advance by run (the output
            // buffer always has slack; see the caller's capacity)
            pos[0] = ch;
            pos[1] = ch;
            pos[2] = ch;
            pos += run;
        }
        i += run;
    }
    return pos;
}

}  // namespace

// indices: uint8[h x w] rows at ``pitch`` bytes apart (pitch >= w:
// device kernels emit 128-aligned padded planes; passing the pitch
// avoids a host repack). palette: uint8[n*3]. out must hold a
// generous upper bound (~h*w*4 + n*16 + 64). Returns bytes written.
long timg_sixel_encode(const uint8_t *indices, int h, int w, int pitch,
                       const uint8_t *palette, int n_colors, char *out,
                       uint8_t *scratch /* w bytes */) {
    char *pos = out;
    pos += sprintf(pos, "\033P0;0;8q\"1;1;%d;%d", w, h);
    for (int i = 0; i < n_colors; ++i) {
        const int r = (palette[i * 3] * 100 + 127) / 255;
        const int g = (palette[i * 3 + 1] * 100 + 127) / 255;
        const int b = (palette[i * 3 + 2] * 100 + 127) / 255;
        *pos++ = '#';
        pos = append_dec_fast(pos, i);
        pos = append_str(pos, ";2;");
        pos = append_dec_fast(pos, r); *pos++ = ';';
        pos = append_dec_fast(pos, g); *pos++ = ';';
        pos = append_dec_fast(pos, b);
    }
    const int n_bands = (h + 5) / 6;
    // Per-band scatter: one pass over the band fills the per-color
    // column bitmasks, then runs are emitted per present color.
    uint8_t *masks = (uint8_t *)calloc(256, (size_t)w);
    bool color_present[256];
    for (int band = 0; band < n_bands; ++band) {
        const int y0 = band * 6;
        const int rows = (h - y0) < 6 ? (h - y0) : 6;
        memset(color_present, 0, sizeof(color_present));
        for (int r = 0; r < rows; ++r) {
            const uint8_t *line = indices + (long)(y0 + r) * pitch;
            const uint8_t bit = (uint8_t)(1 << r);
            for (int x = 0; x < w; ++x) {
                masks[(long)line[x] * w + x] |= bit;
                color_present[line[x]] = true;
            }
        }
        bool first = true;
        for (int color = 0; color < n_colors; ++color) {
            if (!color_present[color]) continue;
            if (!first) *pos++ = '$';
            first = false;
            *pos++ = '#';
            pos = append_dec_fast(pos, color);
            pos = append_sixel_runs(pos, masks + (long)color * w, w);
            memset(masks + (long)color * w, 0, w);
        }
        if (band != n_bands - 1) *pos++ = '-';
    }
    free(masks);
    *pos++ = '\033';
    *pos++ = '\\';
    return pos - out;
}

// Emits the full frame body. glyph: int32[h*w]; fg/bg: uint8[h*w*4];
// eq: uint8[h*w] diff-skip mask or NULL. Returns bytes written.
long timg_ansi_emit(const int32_t *glyph, const uint8_t *fg,
                    const uint8_t *bg, const uint8_t *eq, int hcells,
                    int wcells, int indent, int use_256, char *out) {
    char *pos = out;
    int y_skip = 0;
    for (int r = 0; r < hcells; ++r) {
        const int32_t *grow = glyph + (long)r * wcells;
        const uint8_t *frow = fg + (long)r * wcells * 4;
        const uint8_t *brow = bg + (long)r * wcells * 4;
        const uint8_t *erow = eq ? eq + (long)r * wcells : nullptr;
        int x_skip = indent;
        char *row_start = pos;
        uint32_t last_fg = 0;
        uint32_t last_bg = 0;
        bool fg_unknown = true, bg_unknown = true;
        for (int c = 0; c < wcells; ++c) {
            if (erow && erow[c]) {
                ++x_skip;
                continue;
            }
            if (y_skip) {
                if (y_skip <= 4) {
                    memset(pos, '\n', y_skip);
                    pos += y_skip;
                } else {
                    pos = append_str(pos, "\033[");
                    pos = append_dec(pos, y_skip);
                    *pos++ = 'B';
                }
                y_skip = 0;
            }
            if (x_skip > 0) {
                pos = append_str(pos, "\033[");
                pos = append_dec(pos, x_skip);
                *pos++ = 'C';
                x_skip = 0;
            }
            const int g = grow[c];
            uint32_t f, b;
            memcpy(&f, frow + c * 4, 4);
            memcpy(&b, brow + c * 4, 4);
            bool color_emitted = false;
            if (g != 0 && (fg_unknown || f != last_fg)) {
                pos = append_str(pos, use_256 ? "\033[38;5;" : "\033[38;2;");
                pos = append_color(pos, frow + c * 4, use_256);
                color_emitted = true;
                last_fg = f;
                fg_unknown = false;
            }
            if (bg_unknown || b != last_bg) {
                if (!color_emitted) pos = append_str(pos, "\033[");
                if (brow[c * 4 + 3] < 0x60) {
                    pos = append_str(pos, "49;");
                } else {
                    pos = append_str(pos, use_256 ? "48;5;" : "48;2;");
                    pos = append_color(pos, brow + c * 4, use_256);
                }
                color_emitted = true;
                bg_unknown = false;
            }
            if (color_emitted) pos[-1] = 'm';
            pos = append_str(pos, kGlyphs[g]);
            last_bg = b;
        }
        if (pos == row_start) {
            ++y_skip;
        } else {
            pos = append_str(pos, "\033[0m\n");
        }
    }
    if (pos != out && y_skip) {
        pos = append_str(pos, "\033[");
        pos = append_dec(pos, y_skip);
        *pos++ = 'B';
    }
    return pos - out;
}

// PNG Sub-filter (type 1) row prep for the kitty/iterm2 encoders:
// out[row] = 0x01, px0 raw, then per-channel cur-prev deltas
// (role of ref src/timg-png.cc:124-134; one pass, no temporaries).
void timg_png_sub_filter(const uint8_t *rgba, int h, int w, int ch,
                         uint8_t *out) {
    const long stride = 1 + (long)w * ch;
    for (int y = 0; y < h; ++y) {
        const uint8_t *row = rgba + (long)y * w * 4;
        uint8_t *o = out + (long)y * stride;
        *o++ = 1;
        for (int c = 0; c < ch; ++c) o[c] = row[c];
        for (int x = 1; x < w; ++x) {
            const uint8_t *cur = row + (long)x * 4;
            const uint8_t *prev = cur - 4;
            uint8_t *dst = o + (long)x * ch;
            for (int c = 0; c < ch; ++c)
                dst[c] = (uint8_t)(cur[c] - prev[c]);
        }
    }
}

}  // extern "C"
