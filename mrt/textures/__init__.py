from .atlas import (  # noqa: F401
    TextureAtlas, AtlasBuilder,
    RAW, BLEND, YCBCR, FALLBACK,
    REPEAT, CLAMP, MIRROR,
    LIGHTEN, DARKEN, ADDITION, SUBTRACTION,
)
