"""Protocol model families: the embeddable library API.

Each model bundles a device pipeline (batched JAX program) with a host
byte-emitter for one terminal protocol family — the programmatic
equivalent of the reference's canvas classes, but batch-first: you hand
a model a frame batch, it returns per-frame escape payloads.

    model = timg_tpu.models.get("quarter")(out_h=96, out_w=160)
    payloads = model.render_batch(frames_u8)   # [B,H,W,4] -> list[bytes]
"""

from timg_tpu.models.blocks import HalfBlockModel, QuarterBlockModel  # noqa: F401
from timg_tpu.models.pixel import ITerm2Model, KittyModel, SixelModel  # noqa: F401

_REGISTRY = {
    "half": HalfBlockModel,
    "quarter": QuarterBlockModel,
    "sixel": SixelModel,
    "kitty": KittyModel,
    "iterm2": ITerm2Model,
}


def get(name: str):
    return _REGISTRY[name]


def available() -> list:
    return sorted(_REGISTRY)
