"""Correctly-rounded f32 division and exact floor-sqrt on TPU.

TPU VPU add/mul/sub are IEEE-754 f32, but ``div`` and ``sqrt`` are
*approximate* (measured ~60% bit-equal with correctly-rounded host
results).  The reference (C on x86) gets correctly-rounded ``/`` and
``sqrtf`` from the FPU, so bit-parity of the block/compose/resize paths
needs exact equivalents on device.

``rn_div(x, d)`` — correctly-rounded x/d for finite x >= 0 and positive
normal d, assuming the true quotient is positive-normal (or zero) and is
never exactly an f32 rounding midpoint.  The midpoint-free condition
holds for every division in this codebase, because a midpoint would need
``x * 2^k == (2K+1) * Kd`` with (2K+1)*Kd an odd >24-bit integer, which
no f32 ``x`` in our value lattices can satisfy:

  * blocks.py  ``acc / 3``  — acc integer < 2^18 (sums of u8 squares)
  * compose.py ``v / 255``  — v = rn(integer) < 2^25
  * resize.py  ``1 / w``    — 1/w is a midpoint only if w = 2^k,
                              where the division is exact anyway

Method: take the TPU's approximate quotient y0, then decide the true
rounding with *exact integer* predicates on the significands:
``x/d > midpoint_above(y)``  <=>  ``Kx * 2^t > (2K+1) * Kd`` where
K/E are the 24-bit significand and biased exponent of each value.  The
right side is a <2^49 integer evaluated in 32-bit limbs; the left is a
shifted 24-bit integer.  The true bit-pattern is recovered from up to a
±2-ulp error in y0 by counting how many of 4 consecutive midpoints the
true quotient exceeds (the predicate is monotone in y).

``floor_sqrt_255(v)`` — floor(sqrt(v)) clamped to [0,255] for
v in [0, 65536).  Equals the reference's ``(uint8)min(sqrtf(v), 255)``
for every value our pipelines feed it: truncation of a correctly-rounded
sqrt differs from floor(sqrt) only when v lies within ~n*2^-16 below a
perfect square n^2, and the value lattices here (averages m/n of integer
sums, blends rn(m)/255) keep a distance of at least 1/510 from below any
n^2 — see ops/blocks.py / ops/compose.py call sites.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MANT = jnp.uint32(0x7FFFFF)
_IMPL = jnp.uint32(0x800000)


def _mul_25x24(a: jax.Array, b: jax.Array):
    """Exact 64-bit product of u32 integers a < 2^25, b < 2^24 as (hi, lo)."""
    ah, al = a >> 16, a & jnp.uint32(0xFFFF)
    bh, bl = b >> 16, b & jnp.uint32(0xFFFF)
    ll = al * bl                       # < 2^32, exact as u32
    ms = ah * bl + al * bh             # < 2^26
    lo = ll + ((ms & jnp.uint32(0xFFFF)) << 16)
    carry = (lo < ll).astype(jnp.uint32)
    hi = ah * bh + (ms >> 16) + carry  # < 2^18
    return hi, lo


def rn_div(x: jax.Array, d: jax.Array) -> jax.Array:
    """Correctly-rounded f32 ``x / d`` (see module docstring for domain)."""
    x = jnp.asarray(x, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    x, d = jnp.broadcast_arrays(x, d)
    y0 = x / d  # approximate on TPU; seeds the candidate window

    bx = jax.lax.bitcast_convert_type(x, jnp.uint32)
    bd = jax.lax.bitcast_convert_type(d, jnp.uint32)
    by = jax.lax.bitcast_convert_type(y0, jnp.uint32)
    kx = (bx & _MANT) | _IMPL
    ex = (bx >> 23).astype(jnp.int32)
    kd = (bd & _MANT) | _IMPL
    ed = (bd >> 23).astype(jnp.int32)

    base = by - jnp.uint32(2)
    adv = jnp.zeros(by.shape, jnp.uint32)
    for j in range(4):
        bits = base + jnp.uint32(j)
        k = (bits & _MANT) | _IMPL
        e = (bits >> 23).astype(jnp.int32)
        rhs_hi, rhs_lo = _mul_25x24(jnp.uint32(2) * k + jnp.uint32(1), kd)
        # predicate: x/d > (2k+1)*2^(e-151)  <=>  kx*2^t > (2k+1)*kd
        t = ex + jnp.int32(151) - e - ed
        tc = jnp.clip(t, 1, 31).astype(jnp.uint32)
        lhs_hi = kx >> (jnp.uint32(32) - tc)
        lhs_lo = kx << tc
        gt = (lhs_hi > rhs_hi) | ((lhs_hi == rhs_hi) & (lhs_lo > rhs_lo))
        p = jnp.where(t >= 32, True, jnp.where(t <= 0, False, gt))
        adv = adv + p.astype(jnp.uint32)

    exact = jax.lax.bitcast_convert_type(base + adv, jnp.float32)
    return jnp.where(x == 0, jnp.float32(0.0), exact)


def floor_sqrt_255(v: jax.Array) -> jax.Array:
    """floor(sqrt(v)) clamped to [0, 255], exact for v in [0, 65536).

    Matches the reference repack ``(uint8)min(sqrtf(v), 255.0f)``
    (ref src/framebuffer.h:150-152, 169-172) on our value lattices.
    """
    t = jnp.floor(jnp.sqrt(v))
    t = jnp.clip(t, jnp.float32(0.0), jnp.float32(255.0))
    for _ in range(2):  # TPU sqrt is within a few ulp; 2 rounds is ample
        t = jnp.maximum(jnp.where(t * t > v, t - jnp.float32(1.0), t),
                        jnp.float32(0.0))
    for _ in range(2):
        up = t + jnp.float32(1.0)
        t = jnp.where((up <= jnp.float32(255.0)) & (up * up <= v), up, t)
    return t
