"""Device-side swscale-exact bilinear video resize (yuv420p -> RGBA).

``--resample=sws-bitexact`` runs the reference's video scaling
algorithm (swscale SWS_BILINEAR, ref src/video-source.cc:352-354,
image-scaler.cc:45-73) ON DEVICE, with SWS_BITEXACT semantics: the one
variant of swscale whose bytes are platform-independent, hence the only
honest cross-backend target (the lib's default output differs by CPU
dispatch — see ops/sws_model.py).  The chain pinned by tests:

    TPU kernel (this file)  ==  numpy mirror (this file)
        ==  scalar model (ops/sws_model.py)  ==  libswscale bitexact

All arithmetic is int32; filters and template selection are computed
host-side per geometry (``plan``) and baked into the jitted program as
constants.  Output is [B, dst_h, dst_w] RGBA-packed int32 words
(alpha 255), the same convention as ops/yuv.yuv420_to_rgba_words, so
the device video window consumes it unchanged.

Odd output widths take libswscale's full-chroma-interpolation path
(SWS_FULL_CHR_H_INT: chroma scaled to the full output width, per-pixel
yuv2rgb_write_full conversion with int32-wraparound semantics); the
kernel models both layouts, so every geometry runs on device.
"""

from __future__ import annotations

import functools

import numpy as np

from timg_tpu.ops import sws_model


def supports(dst_w: int) -> bool:
    """Every geometry is modeled (odd widths since round 4's
    full-chroma reconstruction); kept for call-site compatibility."""
    return True


class Plan:
    """Per-geometry filters + template selection (host-side, numpy)."""

    def __init__(self, src_w: int, src_h: int, dst_w: int, dst_h: int,
                 full_range: bool):
        g = sws_model.sws_geometry(src_w, src_h, dst_w, dst_h)
        self.src_w, self.src_h = src_w, src_h
        self.dst_w, self.dst_h = dst_w, dst_h
        self.chr_src_w, self.chr_src_h = g["chr_src_w"], g["chr_src_h"]
        self.chr_dst_w = g["chr_dst_w"]
        self.full_range = full_range
        hlp, hlc = sws_model.init_filter(g["lum_x_inc"], src_w, dst_w,
                                         4, 1 << 14)
        hcp, hcc = sws_model.init_filter(g["chr_x_inc"], self.chr_src_w,
                                         self.chr_dst_w, 4, 1 << 14)
        vlp, vlc = sws_model.init_filter(g["lum_y_inc"], src_h, dst_h,
                                         2, 1 << 12)
        vcp, vcc = sws_model.init_filter(g["chr_y_inc"], self.chr_src_h,
                                         dst_h, 2, 1 << 12)
        self.h_lum_idx = (hlp[:, None] + np.arange(hlc.shape[1])[None, :]
                          ).astype(np.int32)                  # [dstW, F]
        self.h_lum_coef = hlc.astype(np.int32)
        self.h_chr_idx = (hcp[:, None] + np.arange(hcc.shape[1])[None, :]
                          ).astype(np.int32)
        self.h_chr_coef = hcc.astype(np.int32)
        self.v_lum_idx = (vlp[:, None] + np.arange(vlc.shape[1])[None, :]
                          ).astype(np.int32)                  # [dstH, L]
        self.v_lum_coef = vlc.astype(np.int32)
        self.v_chr_idx = (vcp[:, None] + np.arange(vcc.shape[1])[None, :]
                          ).astype(np.int32)
        self.v_chr_coef = vcc.astype(np.int32)
        self.v_lum_size = vlc.shape[1]
        self.v_chr_size = vcc.shape[1]
        self.full_chroma = dst_w % 2 == 1  # SWS_FULL_CHR_H_INT
        # ff_get_unscaled_swscale gates the equal-size special converter
        # on EVEN dst height (!(dstH & 1)); odd-height equal-size runs
        # the scaled pipeline with identity filters (sws_model probe).
        self.unscaled = (src_w == dst_w and src_h == dst_h
                         and dst_h % 2 == 0)
        if self.v_lum_size == 1 and self.v_chr_size <= 2:
            self.template = 1
            self.uvalpha = (vcc[:, 1].astype(np.int32)
                            if self.v_chr_size == 2
                            else np.zeros(dst_h, np.int32))
        elif self.v_lum_size == 2 and self.v_chr_size == 2:
            self.template = 2
            self.yalpha = vlc[:, 1].astype(np.int32)
            self.uvalpha = vcc[:, 1].astype(np.int32)
        else:
            self.template = 0  # general X


@functools.lru_cache(maxsize=32)
def get_plan(src_w: int, src_h: int, dst_w: int, dst_h: int,
             full_range: bool) -> Plan:
    return Plan(src_w, src_h, dst_w, dst_h, full_range)


def _unscaled_pipeline(xp, y, u, v, plan: Plan):
    """Equal-size special converter (ff_yuv2rgb_get_func_ptr path):
    value-composed conversion, chroma shared per 2x2 block (see
    sws_model.unscaled_yuv420_to_rgba)."""
    cst = (sws_model.FULL_UNSCALED if plan.full_range
           else sws_model.MPEG_UNSCALED)
    h, w = plan.src_h, plan.src_w
    yv = y.astype(xp.int32)
    uu = xp.repeat(xp.repeat(u.astype(xp.int32), 2, axis=1), 2,
                   axis=2)[:, :h, :w]
    vv = xp.repeat(xp.repeat(v.astype(xp.int32), 2, axis=1), 2,
                   axis=2)[:, :h, :w]
    f = (cst["a0"] + yv * cst["cy"]) >> 16
    r = xp.clip(f + ((cst["crv"] * (vv - 128)) >> 16), 0, 255)
    g = xp.clip(f + ((cst["cgu"] * (uu - 128)) >> 16)
                + ((cst["cgv"] * (vv - 128)) >> 16), 0, 255)
    b = xp.clip(f + ((cst["cbu"] * (uu - 128)) >> 16), 0, 255)
    return r | (g << 8) | (b << 16) | xp.int32(-(1 << 24))


def _pipeline(xp, y, u, v, plan: Plan):
    """Shared numpy/jax.numpy implementation ([B,H,W] u8 planes in)."""
    if plan.unscaled:
        return _unscaled_pipeline(xp, y, u, v, plan)

    def hscale(src, idx, coef):
        # [B, H, srcW] u8 -> [B, H, dstW] i32 15-bit.  The post-sum
        # int32 cast matters: numpy promotes int32 sums to int64,
        # which would dodge the int32 wraparound the C path (and the
        # jax kernel) has on extreme inputs.
        win = xp.take(src.astype(xp.int32), idx.reshape(-1), axis=-1)
        win = win.reshape(src.shape[:-1] + idx.shape)
        acc = (win * coef[None, None]).sum(-1).astype(xp.int32)
        return xp.minimum(acc >> 7, 32767)

    y15 = hscale(y, plan.h_lum_idx, plan.h_lum_coef)
    u15 = hscale(u, plan.h_chr_idx, plan.h_chr_coef)
    v15 = hscale(v, plan.h_chr_idx, plan.h_chr_coef)

    def vlines(p15, idx):
        # [B, srcH, W] -> [B, dstH, L, W]
        g = xp.take(p15, idx.reshape(-1), axis=1)
        return g.reshape(p15.shape[0], idx.shape[0], idx.shape[1],
                         p15.shape[2])

    ly = vlines(y15, plan.v_lum_idx)            # [B, dstH, L, dstW]
    lu = vlines(u15, plan.v_chr_idx)
    lv = vlines(v15, plan.v_chr_idx)

    if plan.full_chroma:
        return _full_chroma_pack(xp, ly, lu, lv, plan)

    if plan.template == 1:
        uva = plan.uvalpha[None, :, None]
        y1 = (ly[:, :, 0] + 64) >> 7
        if plan.v_chr_size == 2:
            avg = uva >= 2048
            uu = xp.where(avg, (lu[:, :, 0] + lu[:, :, 1] + 128) >> 8,
                          (lu[:, :, 0] + 64) >> 7)
            vv = xp.where(avg, (lv[:, :, 0] + lv[:, :, 1] + 128) >> 8,
                          (lv[:, :, 0] + 64) >> 7)
        else:
            uu = (lu[:, :, 0] + 64) >> 7
            vv = (lv[:, :, 0] + 64) >> 7
    elif plan.template == 2:
        ya = plan.yalpha[None, :, None]
        uva = plan.uvalpha[None, :, None]
        y1 = (ly[:, :, 0] * (4096 - ya) + ly[:, :, 1] * ya) >> 19
        uu = (lu[:, :, 0] * (4096 - uva) + lu[:, :, 1] * uva) >> 19
        vv = (lv[:, :, 0] * (4096 - uva) + lv[:, :, 1] * uva) >> 19
    else:
        vlc = plan.v_lum_coef[None, :, :, None]
        vcc = plan.v_chr_coef[None, :, :, None]
        y1 = xp.clip(((1 << 18) + (ly * vlc).sum(2).astype(xp.int32))
                     >> 19, 0, 255)
        uu = xp.clip(((1 << 18) + (lu * vcc).sum(2).astype(xp.int32))
                     >> 19, 0, 255)
        vv = xp.clip(((1 << 18) + (lv * vcc).sum(2).astype(xp.int32))
                     >> 19, 0, 255)

    cst = (sws_model.FULL_SCALED if plan.full_range
           else sws_model.MPEG_SCALED)

    def off(c, coef):
        return ((c * coef) >> 16) - (coef >> 9)

    def tab(idx):
        return xp.clip((cst["a0"] + idx * cst["cy"]) >> 16, 0, 255)

    # chroma shared per output pixel pair: [B,dstH,chrW] -> [B,dstH,dstW]
    ou_g, ou_b = off(uu, cst["cgu"]), off(uu, cst["cbu"])
    ov_r, ov_g = off(vv, cst["crv"]), off(vv, cst["cgv"])

    def widen(c):
        rep = xp.stack([c, c], axis=-1)
        return rep.reshape(c.shape[:-1] + (2 * c.shape[-1],)
                           )[..., :plan.dst_w]

    r = tab(y1 + widen(ov_r))
    g = tab(y1 + widen(ou_g) + widen(ov_g))
    b = tab(y1 + widen(ou_b))
    return r | (g << 8) | (b << 16) | xp.int32(-(1 << 24))


def _full_chroma_pack(xp, ly, lu, lv, plan: Plan):
    """Odd dst_w (SWS_FULL_CHR_H_INT): yuv2rgb_full_{1,2,X} vertical
    templates (19-bit >>10 intermediates) + per-pixel
    yuv2rgb_write_full.  All arithmetic int32 — the C path's
    wraparound IS the semantics (see sws_model._write_full)."""
    if plan.template == 1:
        y1 = ly[:, :, 0] << 2
        if plan.v_chr_size == 2:
            avg = plan.uvalpha[None, :, None] >= 2048
            uu = xp.where(avg,
                          (lu[:, :, 0] + lu[:, :, 1] - (128 << 8)) << 1,
                          (lu[:, :, 0] - (128 << 7)) << 2)
            vv = xp.where(avg,
                          (lv[:, :, 0] + lv[:, :, 1] - (128 << 8)) << 1,
                          (lv[:, :, 0] - (128 << 7)) << 2)
        else:
            uu = (lu[:, :, 0] - (128 << 7)) << 2
            vv = (lv[:, :, 0] - (128 << 7)) << 2
    elif plan.template == 2:
        ya = plan.yalpha[None, :, None]
        uva = plan.uvalpha[None, :, None]
        y1 = (ly[:, :, 0] * (4096 - ya) + ly[:, :, 1] * ya) >> 10
        uu = (lu[:, :, 0] * (4096 - uva) + lu[:, :, 1] * uva
              - (128 << 19)) >> 10
        vv = (lv[:, :, 0] * (4096 - uva) + lv[:, :, 1] * uva
              - (128 << 19)) >> 10
    else:
        vlc = plan.v_lum_coef[None, :, :, None]
        vcc = plan.v_chr_coef[None, :, :, None]
        y1 = ((1 << 9) + (ly * vlc).sum(2).astype(xp.int32)) >> 10
        uu = ((1 << 9) - (128 << 19)
              + (lu * vcc).sum(2).astype(xp.int32)) >> 10
        vv = ((1 << 9) - (128 << 19)
              + (lv * vcc).sum(2).astype(xp.int32)) >> 10

    cst = sws_model.full_chroma_coeffs(plan.full_range)
    y1 = (y1 - cst["y_off"]) * cst["y_coe"] + (1 << 21)
    r = y1 + vv * cst["v2r"]
    g = y1 + vv * cst["v2g"] + uu * cst["u2g"]
    b = y1 + uu * cst["u2b"]

    def clip30(x):
        return xp.clip(x, 0, (1 << 30) - 1)

    r = clip30(r) >> 22
    g = clip30(g) >> 22
    b = clip30(b) >> 22
    return r | (g << 8) | (b << 16) | xp.int32(-(1 << 24))


def sws_yuv420_to_rgba_words_np(y: np.ndarray, u: np.ndarray,
                                v: np.ndarray, dst_h: int, dst_w: int,
                                full_range: bool) -> np.ndarray:
    """Strict numpy mirror: [B,H,W]+chroma planes -> [B,dstH,dstW] i32."""
    plan = get_plan(y.shape[-1], y.shape[-2], dst_w, dst_h, full_range)
    out = _pipeline(np, y, u, v, plan)
    return out.astype(np.int32)


def sws_yuv420_to_rgba_words(y, u, v, dst_h: int, dst_w: int,
                             full_range: bool):
    """Device version (trace inside jit); same bytes as the mirror."""
    import jax.numpy as jnp
    plan = get_plan(y.shape[-1], y.shape[-2], dst_w, dst_h, full_range)
    return _pipeline(jnp, y, u, v, plan).astype(jnp.int32)
