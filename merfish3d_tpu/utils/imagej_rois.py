"""Minimal ImageJ ROI (.roi / RoiSet .zip) polygon reader + writer.

The reference exports Cellpose cell outlines as an ImageJ ROI zip
(``segmentation/cellpose/imagej_rois/global_coords_rois.zip``) and reads it
back with the ``roifile`` package (reference `viewer.py:965-1010`,
`cli/qi2lab_microscopes/segment_fiducial.py`). Neither ``roifile`` nor
ImageJ is available in this image, so this module implements the polygon
subset of the public ImageJ ROI byte format directly:

====================  ======================================================
offset                field (big-endian)
====================  ======================================================
0-3                   magic ``"Iout"``
4-5                   version
6                     roi type (0 = polygon, 7 = freehand)
8-15                  top, left, bottom, right (int16)
16-17                 n coordinates
50-51                 options (bit 128 = sub-pixel resolution)
64..64+4n             int16 x's (relative to left) then int16 y's (rel. top)
64+4n..64+12n         float32 absolute x's then y's (when sub-pixel bit set)
====================  ======================================================

A RoiSet ``.zip`` is a plain zip archive of one ``.roi`` file per ROI.
Sub-pixel float coordinates are always written (cell outlines are in global
microns), so round-trips are exact.
"""

from __future__ import annotations

import struct
import zipfile
from pathlib import Path
from typing import Mapping, Sequence, Union

import numpy as np

_MAGIC = b"Iout"
_VERSION = 227
_TYPE_POLYGON = 0
_TYPE_FREEHAND = 7
_OPT_SUBPIXEL = 128
_HEADER_SIZE = 64


def encode_polygon_roi(xy: np.ndarray, name: str | None = None) -> bytes:
    """Encode one (N, 2) [x, y] polygon as an ImageJ .roi blob with
    sub-pixel float coordinates."""
    xy = np.asarray(xy, dtype=np.float64)
    if xy.ndim != 2 or xy.shape[1] != 2 or xy.shape[0] < 2:
        raise ValueError("expected an (N>=2, 2) array of [x, y] vertices")
    n = xy.shape[0]
    left = int(np.floor(xy[:, 0].min()))
    top = int(np.floor(xy[:, 1].min()))
    right = int(np.ceil(xy[:, 0].max()))
    bottom = int(np.ceil(xy[:, 1].max()))

    header = bytearray(_HEADER_SIZE)
    header[0:4] = _MAGIC
    struct.pack_into(">h", header, 4, _VERSION)
    header[6] = _TYPE_POLYGON
    struct.pack_into(">4h", header, 8, top, left, bottom, right)
    struct.pack_into(">H", header, 16, n)
    struct.pack_into(">H", header, 50, _OPT_SUBPIXEL)

    ints_x = np.clip(np.round(xy[:, 0]) - left, -32768, 32767).astype(">i2")
    ints_y = np.clip(np.round(xy[:, 1]) - top, -32768, 32767).astype(">i2")
    floats_x = xy[:, 0].astype(">f4")
    floats_y = xy[:, 1].astype(">f4")
    return (
        bytes(header)
        + ints_x.tobytes() + ints_y.tobytes()
        + floats_x.tobytes() + floats_y.tobytes()
    )


def decode_polygon_roi(blob: bytes) -> np.ndarray:
    """Decode an ImageJ .roi polygon/freehand blob to (N, 2) [x, y] floats,
    preferring the sub-pixel float block when present."""
    if blob[:4] != _MAGIC:
        raise ValueError("not an ImageJ ROI (missing 'Iout' magic)")
    roi_type = blob[6]
    if roi_type not in (_TYPE_POLYGON, _TYPE_FREEHAND):
        raise ValueError(f"unsupported ImageJ ROI type {roi_type}")
    top, left = struct.unpack_from(">2h", blob, 8)
    (n,) = struct.unpack_from(">H", blob, 16)
    (options,) = struct.unpack_from(">H", blob, 50)
    int_block = _HEADER_SIZE + 4 * n
    if options & _OPT_SUBPIXEL and len(blob) >= int_block + 8 * n:
        xs = np.frombuffer(blob, dtype=">f4", count=n, offset=int_block)
        ys = np.frombuffer(blob, dtype=">f4", count=n, offset=int_block + 4 * n)
    else:
        xs = np.frombuffer(blob, dtype=">i2", count=n, offset=_HEADER_SIZE) + left
        ys = np.frombuffer(blob, dtype=">i2", count=n,
                           offset=_HEADER_SIZE + 2 * n) + top
    return np.stack([xs, ys], axis=1).astype(np.float64)


def write_imagej_rois_zip(
    path: Union[str, Path],
    outlines: Union[Mapping, Sequence[np.ndarray]],
) -> Path:
    """Write polygons as an ImageJ RoiSet zip. ``outlines`` is either a
    mapping id → (N, 2) [x, y] array or a sequence of arrays."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if isinstance(outlines, Mapping):
        items = list(outlines.items())
    else:
        items = list(enumerate(outlines, start=1))
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for idx, (key, xy) in enumerate(items, start=1):
            zf.writestr(f"{idx:04d}-{key}.roi", encode_polygon_roi(np.asarray(xy)))
    return path


def read_imagej_rois_zip(path: Union[str, Path]) -> dict[int, np.ndarray]:
    """Read an ImageJ RoiSet zip into {1-based index: (N, 2) [x, y]} —
    the outline container the reference viewer builds from ``roifile``
    (reference `viewer.py:965-1010`)."""
    outlines: dict[int, np.ndarray] = {}
    with zipfile.ZipFile(path) as zf:
        names = sorted(n for n in zf.namelist() if n.endswith(".roi"))
        for idx, name in enumerate(names, start=1):
            outlines[idx] = decode_polygon_roi(zf.read(name))
    return outlines
