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


def _ome_xml_stack(shape_czyx, dtype: np.dtype, spacing_zyx_um,
                   emission_wavelengths_um=None) -> str:
    ome_types = {"uint8": "uint8", "uint16": "uint16", "float32": "float"}
    pixel_type = ome_types[np.dtype(dtype).name]
    nc, nz, ny, nx = shape_czyx
    channels = ""
    for c in range(nc):
        em = ""
        if emission_wavelengths_um is not None:
            em = (
                f' EmissionWavelength="{float(emission_wavelengths_um[c]) * 1000.0}"'
                ' EmissionWavelengthUnit="nm"'
            )
        channels += f'<Channel ID="Channel:0:{c}" Name="ch{c}"{em} SamplesPerPixel="1"/>'
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0" Name="bead stack">'
        f'<Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="{pixel_type}" '
        f'SizeX="{nx}" SizeY="{ny}" SizeC="{nc}" SizeZ="{nz}" SizeT="1" '
        f'PhysicalSizeX="{float(spacing_zyx_um[2])}" PhysicalSizeXUnit="µm" '
        f'PhysicalSizeY="{float(spacing_zyx_um[1])}" PhysicalSizeYUnit="µm" '
        f'PhysicalSizeZ="{float(spacing_zyx_um[0])}" PhysicalSizeZUnit="µm">'
        f'{channels}<TiffData/></Pixels></Image></OME>'
    )


def write_ome_tiff_stack(
    path: Union[str, Path],
    image_czyx: np.ndarray,
    spacing_zyx_um,
    emission_wavelengths_um=None,
) -> Path:
    """Write a (C, Z, Y, X) stack as a multi-page baseline OME-TIFF with
    per-channel emission wavelengths in the OME-XML (the bead-acquisition
    format the reference's chromatic calibration parses,
    `chromatic.py:100-169`). Pages are emitted Z-fastest (DimensionOrder
    XYZCT)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    image_czyx = np.ascontiguousarray(image_czyx)
    if image_czyx.ndim != 4:
        raise ValueError("expected a (C, Z, Y, X) stack")
    if image_czyx.dtype not in (np.uint8, np.uint16, np.float32):
        image_czyx = np.clip(image_czyx, 0, 2**16 - 1).astype(np.uint16)
    nc, nz, ny, nx = image_czyx.shape
    bits = image_czyx.dtype.itemsize * 8
    sample_format = 3 if image_czyx.dtype == np.float32 else 1
    description = _ome_xml_stack(
        image_czyx.shape, image_czyx.dtype, spacing_zyx_um,
        emission_wavelengths_um,
    ).encode() + b"\x00"

    n_pages = nc * nz
    page_bytes = ny * nx * image_czyx.dtype.itemsize
    entries = 10  # per-IFD tag count (description only on page 0: +1 there)

    def entry(tag, ttype, count, value) -> bytes:
        return struct.pack("<HHII", tag, ttype, count, value)

    # layout: header | IFD0..IFDn | description | pixel pages
    ifd_sizes = [2 + (entries + (1 if p == 0 else 0)) * 12 + 4
                 for p in range(n_pages)]
    ifd_offsets = []
    pos = 8
    for s in ifd_sizes:
        ifd_offsets.append(pos)
        pos += s
    desc_offset = pos
    pixel_base = desc_offset + len(description)

    blobs = []
    for p in range(n_pages):
        ifd = struct.pack("<H", entries + (1 if p == 0 else 0))
        ifd += entry(_TAG_WIDTH, _TYPE_LONG, 1, nx)
        ifd += entry(_TAG_LENGTH, _TYPE_LONG, 1, ny)
        ifd += entry(_TAG_BITS, _TYPE_SHORT, 1, bits)
        ifd += entry(_TAG_COMPRESSION, _TYPE_SHORT, 1, 1)
        ifd += entry(_TAG_PHOTOMETRIC, _TYPE_SHORT, 1, 1)
        if p == 0:
            ifd += entry(_TAG_DESCRIPTION, _TYPE_ASCII, len(description),
                         desc_offset)
        ifd += entry(_TAG_STRIP_OFFSETS, _TYPE_LONG, 1,
                     pixel_base + p * page_bytes)
        ifd += entry(_TAG_ROWS_PER_STRIP, _TYPE_LONG, 1, ny)
        ifd += entry(_TAG_STRIP_BYTES, _TYPE_LONG, 1, page_bytes)
        ifd += entry(_TAG_RESUNIT, _TYPE_SHORT, 1, 1)
        ifd += entry(_TAG_SAMPLEFORMAT, _TYPE_SHORT, 1, sample_format)
        next_off = ifd_offsets[p + 1] if p + 1 < n_pages else 0
        ifd += struct.pack("<I", next_off)
        blobs.append(ifd)

    # pages Z-fastest within each channel: reorder (C, Z) → page index
    pages = image_czyx.reshape(nc * nz, ny, nx)
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", 8))
        for b in blobs:
            f.write(b)
        f.write(description)
        f.write(pages.astype(pages.dtype.newbyteorder("<")).tobytes())
    return path


def read_ome_tiff_stack(path: Union[str, Path]):
    """Read a multi-page OME-TIFF into (C, Z, Y, X) plus metadata parsed
    from the OME-XML ImageDescription: (array, spacing_zyx_um or None,
    emission_wavelengths_um or None). Pages are interpreted per the
    DimensionOrder (Z-fastest for XYZCT, C-fastest for XYCZT)."""
    import xml.etree.ElementTree as ET

    from PIL import Image

    path = Path(path)
    img = Image.open(path)
    # the OME-XML lives on page 0 only; grab it before seeking (tag_v2
    # reflects the CURRENT frame)
    desc = img.tag_v2.get(270) if hasattr(img, "tag_v2") else None
    frames = []
    for i in range(getattr(img, "n_frames", 1)):
        img.seek(i)
        frames.append(np.asarray(img))
    stack = np.stack(frames)
    if isinstance(desc, tuple):
        desc = desc[0] if desc else None
    nc = nz = None
    order = "XYZCT"
    spacing = None
    wavelengths = None
    if desc and "<OME" in str(desc):
        root = ET.fromstring(str(desc))
        ns = root.tag.split("}")[0] + "}" if root.tag.startswith("{") else ""
        pixels = root.find(f"{ns}Image/{ns}Pixels")
        if pixels is not None:
            nc = int(pixels.attrib.get("SizeC", 1))
            nz = int(pixels.attrib.get("SizeZ", 1))
            order = pixels.attrib.get("DimensionOrder", order)
            try:
                spacing = (
                    float(pixels.attrib["PhysicalSizeZ"]),
                    float(pixels.attrib["PhysicalSizeY"]),
                    float(pixels.attrib["PhysicalSizeX"]),
                )
            except KeyError:
                spacing = None
            wl = []
            for ch in pixels.findall(f"{ns}Channel"):
                v = ch.attrib.get("EmissionWavelength")
                if v is None:
                    wl = None
                    break
                v = float(v)
                # nm vs µm: OME defaults to nm; anything > 10 is nm
                wl.append(v / 1000.0 if v > 10.0 else v)
            wavelengths = wl or None
    if nc is None or nz is None or nc * nz != len(stack):
        nc, nz = 1, len(stack)
    ny, nx = stack.shape[1:]
    if order.upper().startswith("XYC"):  # C-fastest pages
        arr = stack.reshape(nz, nc, ny, nx).transpose(1, 0, 2, 3)
    else:  # Z-fastest (XYZCT)
        arr = stack.reshape(nc, nz, ny, nx)
    return arr, spacing, wavelengths


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
