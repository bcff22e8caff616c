"""Self-contained NDTiff v2/v3 reader + writer (no ndstorage/tifffile).

The reference consumes qi2lab-microscope raw acquisitions through
``ndstorage.Dataset`` (reference `cli/qi2lab_microscopes/create_datastore.py:79`)
and ``tifffile.imread`` of the ``*_NDTiffStack.tif`` files. Neither wheel is
available in this image, so this module implements the NDTiff storage format
directly from its public specification (the ``NDTiff.index`` sidecar written
by NDTiffStorage / Micro-Manager / pycromanager).

``NDTiff.index`` is a flat little-endian stream of entries, one per image:

====================  ========================================================
field                 bytes
====================  ========================================================
axes length K         4 (uint32)
axes                  K  (UTF-8 JSON dict, e.g. ``{"channel": 0, "z": 3}``)
filename length N     4 (uint32)
filename              N  (UTF-8, TIFF file inside the dataset directory)
pixel offset          4 (uint32; byte offset of the pixel data in that file)
image width           4 (uint32)
image height          4 (uint32)
pixel type            4 (uint32; 0=8bit 1=16bit 2=8bitRGB 3=10 4=12 5=14 6=11)
pixel compression     4 (uint32; 0 = uncompressed)
metadata offset       4 (uint32; byte offset of the per-image JSON metadata)
metadata length       4 (uint32)
metadata compression  4 (uint32; 0 = uncompressed UTF-8 JSON)
====================  ========================================================

Because the index carries absolute pixel offsets, reading never touches the
TIFF IFD structures at all — this is the same fast path ndstorage uses. The
writer, used by the tests and the synthetic-experiment tooling, nevertheless
emits fully valid classic (little-endian) TIFF files so external tools can
open them too.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Iterator, Mapping, Sequence, Union

import numpy as np

INDEX_FILENAME = "NDTiff.index"

# NDTiff pixel-type codes → numpy dtype. The >8-bit monochrome flavours are
# all stored as little-endian uint16 on disk.
_PIXEL_DTYPES = {
    0: np.dtype("uint8"),
    1: np.dtype("<u2"),
    3: np.dtype("<u2"),
    4: np.dtype("<u2"),
    5: np.dtype("<u2"),
    6: np.dtype("<u2"),
}


class _IndexEntry:
    __slots__ = (
        "axes",
        "filename",
        "pixel_offset",
        "width",
        "height",
        "pixel_type",
        "metadata_offset",
        "metadata_length",
    )

    def __init__(self, axes, filename, pixel_offset, width, height,
                 pixel_type, metadata_offset, metadata_length):
        self.axes = axes
        self.filename = filename
        self.pixel_offset = pixel_offset
        self.width = width
        self.height = height
        self.pixel_type = pixel_type
        self.metadata_offset = metadata_offset
        self.metadata_length = metadata_length


def _iter_index_entries(buf: bytes) -> Iterator[_IndexEntry]:
    pos = 0
    n = len(buf)
    while pos + 4 <= n:
        (k,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        axes = json.loads(buf[pos : pos + k].decode("utf-8"))
        pos += k
        (fn_len,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        filename = buf[pos : pos + fn_len].decode("utf-8")
        pos += fn_len
        (
            pixel_offset,
            width,
            height,
            pixel_type,
            pixel_compression,
            md_offset,
            md_length,
            md_compression,
        ) = struct.unpack_from("<8I", buf, pos)
        pos += 32
        if pixel_compression != 0 or md_compression != 0:
            raise ValueError(
                "compressed NDTiff entries are not supported "
                f"(pixel={pixel_compression}, metadata={md_compression})"
            )
        yield _IndexEntry(
            axes, filename, pixel_offset, width, height,
            pixel_type, md_offset, md_length,
        )


def _axes_key(axes: Mapping[str, Any]) -> tuple:
    return tuple(sorted(axes.items(), key=lambda kv: kv[0]))


class NDTiffDataset:
    """Read-only view of one NDTiff dataset directory.

    Implements the subset of the ``ndstorage.Dataset`` API the reference
    conversion CLI uses (`create_datastore.py:79-497`):
    ``get_image_coordinates_list``, ``read_metadata``, ``read_image``, plus
    ``as_array`` to assemble the full (channel, z, y, x) stack — replacing the
    reference's ``tifffile.imread(*_NDTiffStack.tif)``.
    """

    def __init__(self, path: Union[str, Path]):
        self.path = Path(path)
        index_path = self.path / INDEX_FILENAME
        if not index_path.exists():
            raise FileNotFoundError(f"no {INDEX_FILENAME} under {self.path}")
        self._entries: dict[tuple, _IndexEntry] = {}
        for entry in _iter_index_entries(index_path.read_bytes()):
            self._entries[_axes_key(entry.axes)] = entry
        self._order = list(self._entries)

    # -- ndstorage.Dataset API subset ------------------------------------
    def get_image_coordinates_list(self) -> list[dict]:
        return [dict(key) for key in self._order]

    def _entry(self, axes: Mapping[str, Any]) -> _IndexEntry:
        key = _axes_key(axes)
        try:
            return self._entries[key]
        except KeyError:
            raise KeyError(f"no NDTiff image at axes {dict(axes)}") from None

    def read_metadata(self, **axes) -> dict:
        entry = self._entry(axes)
        with open(self.path / entry.filename, "rb") as f:
            f.seek(entry.metadata_offset)
            return json.loads(f.read(entry.metadata_length).decode("utf-8"))

    def read_image(self, **axes) -> np.ndarray:
        entry = self._entry(axes)
        dtype = _PIXEL_DTYPES.get(entry.pixel_type)
        if dtype is None:
            raise ValueError(f"unsupported NDTiff pixel type {entry.pixel_type}")
        count = entry.width * entry.height
        with open(self.path / entry.filename, "rb") as f:
            f.seek(entry.pixel_offset)
            data = f.read(count * dtype.itemsize)
        return np.frombuffer(data, dtype=dtype).reshape(entry.height, entry.width)

    # -- stack assembly ----------------------------------------------------
    def axis_values(self, axis: str) -> list:
        seen: dict[Any, None] = {}
        for key in self._order:
            for name, value in key:
                if name == axis:
                    seen.setdefault(value, None)
        return list(seen)

    def as_array(
        self,
        channel_axis: str = "channel",
        z_axis: str = "z",
        channels: Sequence[Any] | None = None,
    ) -> np.ndarray:
        """Assemble the full (channel, z, y, x) stack in index order.

        Channel order follows first appearance in the index (i.e. acquisition
        order — the reference handles reversed acquisition by flipping axis 0
        afterwards, see `create_datastore.py:526`); z is sorted numerically.
        """
        if channels is None:
            channels = self.axis_values(channel_axis)
        if not channels:
            channels = [None]
        z_values = sorted(self.axis_values(z_axis))
        if not z_values:
            z_values = [None]
        planes = []
        for ch in channels:
            for z in z_values:
                axes = {}
                if ch is not None:
                    axes[channel_axis] = ch
                if z is not None:
                    axes[z_axis] = z
                planes.append(self.read_image(**axes))
        stack = np.stack(planes)
        return stack.reshape(len(channels), len(z_values), *stack.shape[-2:])


def read_ndtiff_stack(path: Union[str, Path], **kwargs) -> np.ndarray:
    """One-shot (channel, z, y, x) load of an NDTiff dataset directory."""
    return NDTiffDataset(path).as_array(**kwargs)


# ---------------------------------------------------------------------------
# Writer (tests + synthetic experiments). Emits valid classic TIFF so the
# stack files open in external viewers, plus the NDTiff.index fast path.
# ---------------------------------------------------------------------------

_TIFF_TAGS = {
    "ImageWidth": 256,
    "ImageLength": 257,
    "BitsPerSample": 258,
    "Compression": 259,
    "Photometric": 262,
    "StripOffsets": 273,
    "RowsPerStrip": 278,
    "StripByteCounts": 279,
}


def _tiff_ifd(width: int, height: int, bits: int, strip_offset: int,
              next_ifd_offset: int) -> bytes:
    entries = [
        (_TIFF_TAGS["ImageWidth"], 3, 1, width),
        (_TIFF_TAGS["ImageLength"], 3, 1, height),
        (_TIFF_TAGS["BitsPerSample"], 3, 1, bits),
        (_TIFF_TAGS["Compression"], 3, 1, 1),
        (_TIFF_TAGS["Photometric"], 3, 1, 1),
        (_TIFF_TAGS["StripOffsets"], 4, 1, strip_offset),
        (_TIFF_TAGS["RowsPerStrip"], 3, 1, height),
        (_TIFF_TAGS["StripByteCounts"], 4, 1, width * height * (bits // 8)),
    ]
    out = struct.pack("<H", len(entries))
    for tag, ttype, count, value in entries:
        out += struct.pack("<HHII", tag, ttype, count, value)
    return out + struct.pack("<I", next_ifd_offset)


class NDTiffWriter:
    """Append-only NDTiff dataset writer.

    ``put(image, axes, metadata)`` adds one 2D plane; ``close()`` finalizes
    the TIFF IFD chain and writes ``NDTiff.index``. The stack file is named
    ``{name}_NDTiffStack.tif`` to match the qi2lab microscope layout
    (reference `create_datastore.py:92-97`).
    """

    def __init__(self, path: Union[str, Path], name: str | None = None):
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)
        self.stack_name = f"{name or self.path.name}_NDTiffStack.tif"
        self._f = open(self.path / self.stack_name, "wb")
        # classic little-endian TIFF header; IFD offset patched per image.
        self._f.write(b"II*\x00" + struct.pack("<I", 0))
        self._next_ifd_patch = 4  # where the next IFD offset must be written
        self._index_entries: list[bytes] = []
        self._closed = False

    def put(self, image: np.ndarray, axes: Mapping[str, Any],
            metadata: Mapping[str, Any] | None = None) -> None:
        image = np.ascontiguousarray(image)
        if image.ndim != 2:
            raise ValueError("NDTiffWriter.put expects one 2D plane at a time")
        if image.dtype == np.uint8:
            pixel_type, bits = 0, 8
        else:
            image = image.astype("<u2", copy=False)
            pixel_type, bits = 1, 16
        f = self._f
        f.seek(0, 2)
        pixel_offset = f.tell()
        f.write(image.tobytes())
        md = json.dumps(dict(metadata or {})).encode("utf-8")
        md_offset = f.tell()
        f.write(md)
        ifd_offset = f.tell()
        f.write(_tiff_ifd(image.shape[1], image.shape[0], bits,
                          pixel_offset, 0))
        f.seek(self._next_ifd_patch)
        f.write(struct.pack("<I", ifd_offset))
        # next image must patch this IFD's next-pointer (last 4 bytes).
        self._next_ifd_patch = ifd_offset + 2 + 8 * 12

        axes_json = json.dumps(dict(axes)).encode("utf-8")
        fn = self.stack_name.encode("utf-8")
        self._index_entries.append(
            struct.pack("<I", len(axes_json)) + axes_json
            + struct.pack("<I", len(fn)) + fn
            + struct.pack(
                "<8I",
                pixel_offset, image.shape[1], image.shape[0],
                pixel_type, 0, md_offset, len(md), 0,
            )
        )

    def close(self) -> None:
        if self._closed:
            return
        self._f.close()
        (self.path / INDEX_FILENAME).write_bytes(b"".join(self._index_entries))
        self._closed = True

    def __enter__(self) -> "NDTiffWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def write_ndtiff(
    path: Union[str, Path],
    stack_czyx: np.ndarray,
    *,
    channels: Sequence[Any] | None = None,
    metadata_fn=None,
    name: str | None = None,
) -> Path:
    """Write a (channel, z, y, x) stack as one NDTiff dataset directory.

    ``metadata_fn(channel, z) -> dict`` supplies per-plane metadata (stage
    positions, camera identity, ...).
    """
    stack_czyx = np.asarray(stack_czyx)
    if stack_czyx.ndim != 4:
        raise ValueError("expected a (channel, z, y, x) stack")
    n_ch, n_z = stack_czyx.shape[:2]
    if channels is None:
        channels = list(range(n_ch))
    with NDTiffWriter(path, name=name) as writer:
        for ci, ch in enumerate(channels):
            for z in range(n_z):
                md = metadata_fn(ch, z) if metadata_fn is not None else {}
                writer.put(stack_czyx[ci, z], {"channel": ch, "z": z}, md)
    return Path(path)
