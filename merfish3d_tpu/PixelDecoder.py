"""Reference-compatible import path: the reference exposes
``from merfish3danalysis.PixelDecoder import PixelDecoder`` (plus the
module-level worker/preload helpers, `PixelDecoder.py:70-305`)."""

from .pipeline.chromatic import ChromaticAffineEstimationConfig
from .pipeline.decoder import (
    PixelDecoder,
    decode_tiles_worker,
    preload_cuda_libraries,
    preload_device_libraries,
)
from .utils.dataio import time_stamp

__all__ = [
    "PixelDecoder",
    "ChromaticAffineEstimationConfig",
    "decode_tiles_worker",
    "preload_cuda_libraries",
    "preload_device_libraries",
    "time_stamp",
]
