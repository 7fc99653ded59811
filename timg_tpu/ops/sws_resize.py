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

Odd output widths take libswscale's full-chroma-interpolation path,
which this kernel does not model; callers must gate on even dst_w
(``supports`` below) and fall back to the host leg.
"""

from __future__ import annotations

import functools

import numpy as np

from timg_tpu.ops import sws_model


def supports(dst_w: int) -> bool:
    """Even output widths only (odd -> SWS_FULL_CHR_H_INT in the lib)."""
    return dst_w % 2 == 0


class Plan:
    """Per-geometry filters + template selection (host-side, numpy)."""

    def __init__(self, src_w: int, src_h: int, dst_w: int, dst_h: int,
                 full_range: bool):
        if not supports(dst_w):
            raise ValueError("sws device path requires even dst_w")
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


def _pipeline(xp, y, u, v, plan: Plan):
    """Shared numpy/jax.numpy implementation ([B,H,W] u8 planes in)."""

    def hscale(src, idx, coef):
        # [B, H, srcW] u8 -> [B, H, dstW] i32 15-bit
        win = xp.take(src.astype(xp.int32), idx.reshape(-1), axis=-1)
        win = win.reshape(src.shape[:-1] + idx.shape)
        acc = (win * coef[None, None]).sum(-1)
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
        y1 = xp.clip(((1 << 18) + (ly * vlc).sum(2)) >> 19, 0, 255)
        uu = xp.clip(((1 << 18) + (lu * vcc).sum(2)) >> 19, 0, 255)
        vv = xp.clip(((1 << 18) + (lv * vcc).sum(2)) >> 19, 0, 255)

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
