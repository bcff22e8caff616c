from .decoder import PixelDecoder

__all__ = ["PixelDecoder"]
