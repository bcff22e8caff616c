"""Reference-compatible import path: the reference exposes
``from merfish3danalysis.PixelDecoder import PixelDecoder``."""

from .pipeline.chromatic import ChromaticAffineEstimationConfig
from .pipeline.decoder import PixelDecoder

__all__ = ["PixelDecoder", "ChromaticAffineEstimationConfig"]
