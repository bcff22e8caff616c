"""Minimal OME-TIFF writer (no tifffile in this image).

The reference writes the fused-fiducial max projection as an OME-TIFF for
Cellpose / external viewers (reference `DataRegistration.py:1786-1825`,
via ``tifffile.TiffWriter``). This module writes a classic little-endian
baseline TIFF with an OME-XML ``ImageDescription`` and physical pixel
sizes — uncompressed (the reference uses zlib; baseline keeps every TIFF
reader compatible and Cellpose ingests either).
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Union

import numpy as np

_TYPE_ASCII = 2
_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_RATIONAL = 5

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_DESCRIPTION = 270
_TAG_STRIP_OFFSETS = 273
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTES = 279
_TAG_XRES = 282
_TAG_YRES = 283
_TAG_RESUNIT = 296
_TAG_SAMPLEFORMAT = 339


def _ome_xml(shape_yx, dtype: np.dtype, spacing_yx_um) -> str:
    ome_types = {"uint8": "uint8", "uint16": "uint16", "float32": "float"}
    pixel_type = ome_types[np.dtype(dtype).name]
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0" Name="fused max projection">'
        f'<Pixels ID="Pixels:0" DimensionOrder="XYCZT" Type="{pixel_type}" '
        f'SizeX="{shape_yx[1]}" SizeY="{shape_yx[0]}" SizeC="1" SizeZ="1" '
        f'SizeT="1" PhysicalSizeX="{float(spacing_yx_um[1])}" '
        'PhysicalSizeXUnit="µm" '
        f'PhysicalSizeY="{float(spacing_yx_um[0])}" PhysicalSizeYUnit="µm">'
        '<TiffData/></Pixels></Image></OME>'
    )


def write_ome_tiff_2d(
    path: Union[str, Path],
    image_yx: np.ndarray,
    spacing_yx_um,
) -> Path:
    """Write one 2D plane as baseline OME-TIFF with physical pixel sizes
    (resolution recorded in pixels/cm, as the reference does)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    image_yx = np.ascontiguousarray(image_yx)
    if image_yx.ndim != 2:
        raise ValueError("expected a 2D (y, x) plane")
    if image_yx.dtype not in (np.uint8, np.uint16, np.float32):
        image_yx = np.clip(image_yx, 0, 2**16 - 1).astype(np.uint16)
    bits = image_yx.dtype.itemsize * 8
    sample_format = 3 if image_yx.dtype == np.float32 else 1
    ny, nx = image_yx.shape
    description = _ome_xml((ny, nx), image_yx.dtype, spacing_yx_um).encode() + b"\x00"

    # pixels/cm as TIFF RATIONALs: 1e4 µm per cm over the pixel pitch
    def res_rational(spacing_um: float) -> bytes:
        return struct.pack("<II", int(round(1e8 / float(spacing_um))), 10000)

    header = b"II*\x00" + struct.pack("<I", 8)
    # layout: header | IFD | out-of-line data (description, rationals) | pixels
    entries = 13
    ifd_size = 2 + entries * 12 + 4
    desc_offset = 8 + ifd_size
    xres_offset = desc_offset + len(description)
    yres_offset = xres_offset + 8
    pixel_offset = yres_offset + 8

    def entry(tag, ttype, count, value) -> bytes:
        return struct.pack("<HHII", tag, ttype, count, value)

    ifd = struct.pack("<H", entries)
    ifd += entry(_TAG_WIDTH, _TYPE_LONG, 1, nx)
    ifd += entry(_TAG_LENGTH, _TYPE_LONG, 1, ny)
    ifd += entry(_TAG_BITS, _TYPE_SHORT, 1, bits)
    ifd += entry(_TAG_COMPRESSION, _TYPE_SHORT, 1, 1)
    ifd += entry(_TAG_PHOTOMETRIC, _TYPE_SHORT, 1, 1)
    ifd += entry(_TAG_DESCRIPTION, _TYPE_ASCII, len(description), desc_offset)
    ifd += entry(_TAG_STRIP_OFFSETS, _TYPE_LONG, 1, pixel_offset)
    ifd += entry(_TAG_ROWS_PER_STRIP, _TYPE_LONG, 1, ny)
    ifd += entry(_TAG_STRIP_BYTES, _TYPE_LONG, 1, image_yx.nbytes)
    ifd += entry(_TAG_XRES, _TYPE_RATIONAL, 1, xres_offset)
    ifd += entry(_TAG_YRES, _TYPE_RATIONAL, 1, yres_offset)
    ifd += entry(_TAG_RESUNIT, _TYPE_SHORT, 1, 3)  # centimeter
    ifd += entry(_TAG_SAMPLEFORMAT, _TYPE_SHORT, 1, sample_format)
    ifd += struct.pack("<I", 0)

    with open(path, "wb") as f:
        f.write(header)
        f.write(ifd)
        f.write(description)
        f.write(res_rational(spacing_yx_um[1]))
        f.write(res_rational(spacing_yx_um[0]))
        f.write(image_yx.astype(image_yx.dtype.newbyteorder("<")).tobytes())
    return path
