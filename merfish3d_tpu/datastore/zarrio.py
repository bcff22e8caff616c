"""OME-NGFF v0.5 zarr3 image I/O backed by TensorStore.

Implements the image-store contract of the qi2lab datastore (reference:
`qi2labDataStore.py:1431-1536, 1708-1789, 2239-2370` and `docs/datastore.md`):
each image is a standalone OME-NGFF v0.5 group directory ``<name>.ome.zarr/``
holding a group-level ``zarr.json`` (with the ``ome`` multiscales block plus
flat extra attributes) and a single-scale zarr v3 array at ``0/`` compressed
with blosc (zstd, bitshuffle).

TensorStore gives us a native (C++) async I/O path: reads return futures so
the pipeline can overlap host decompression with TPU compute.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping, Sequence

import numpy as np
import tensorstore as ts

_SPACE_AXES = ("z", "y", "x")


def _json_safe(value: Any) -> Any:
    """Convert numpy scalars/arrays and paths to JSON-encodable types."""
    if isinstance(value, np.ndarray):
        return [_json_safe(v) for v in value.tolist()]
    if isinstance(value, (np.integer,)):
        return int(value)
    if isinstance(value, (np.floating,)):
        return float(value)
    if isinstance(value, (np.bool_,)):
        return bool(value)
    if isinstance(value, Path):
        return str(value)
    if isinstance(value, dict):
        return {str(k): _json_safe(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_json_safe(v) for v in value]
    return value


def _split_bucket_key(url: str, scheme: str) -> tuple[str, str]:
    rest = url[len(scheme):]
    bucket, _, key = rest.partition("/")
    return bucket, key


def kvstore_spec(path: Path | str) -> dict:
    """Map a datastore location to a TensorStore kvstore spec, recognizing
    cloud URLs (reference `qi2labDataStore._get_kvstore_key:1357-1381`).

    s3/gcs locations parse into the bucket + key form the TensorStore
    drivers actually require (the reference passes the whole URL as
    ``path``, which TensorStore rejects); azure is recognized but has no
    open-source TensorStore driver, so it raises with a clear message.
    Plain paths map to the local ``file`` driver; bare http(s) URLs are
    rejected like the reference.
    """
    path_str = str(path)
    if path_str.startswith("s3://"):
        bucket, key = _split_bucket_key(path_str, "s3://")
        return {"driver": "s3", "bucket": bucket, "path": key}
    if path_str.startswith(("gs://", "gcs://")):
        scheme = "gs://" if path_str.startswith("gs://") else "gcs://"
        bucket, key = _split_bucket_key(path_str, scheme)
        return {"driver": "gcs", "bucket": bucket, "path": key}
    if "s3.amazonaws.com" in path_str:
        # https://<bucket>.s3.amazonaws.com/<key> virtual-hosted form
        host_rest = path_str.split("://", 1)[-1]
        host, _, key = host_rest.partition("/")
        bucket = host.split(".s3.amazonaws.com")[0]
        return {"driver": "s3", "bucket": bucket, "path": key}
    if "storage.googleapis.com" in path_str:
        tail = path_str.split("storage.googleapis.com/", 1)[-1]
        bucket, _, key = tail.partition("/")
        return {"driver": "gcs", "bucket": bucket, "path": key}
    if path_str.startswith("azure://") or "blob.core.windows.net" in path_str:
        raise ValueError(
            "Azure locations are recognized but TensorStore has no "
            "open-source azure kvstore driver; mirror the data to s3/gcs "
            "or a local path."
        )
    if path_str.startswith(("http://", "https://")):
        raise ValueError("Unsupported cloud storage provider in URL")
    return {"driver": "file", "path": path_str}


def image_store_path(path: Path | str) -> Path:
    """Normalize a logical image name to its ``.ome.zarr`` directory."""
    p = Path(path)
    if p.name.endswith(".ome.zarr"):
        return p
    if p.suffixes:
        raise ValueError(
            f"Invalid image store name '{p.name}'; use bare names or '.ome.zarr'."
        )
    return p.with_name(p.name + ".ome.zarr")


def default_chunks(shape: Sequence[int]) -> list[int]:
    """Default chunk layout: z-plane chunks ``[1, Y, X]`` for 3D stacks.

    Matches the reference access pattern (per-z-plane decode loops;
    `qi2labDataStore.py:1570-1591`). Leading non-spatial axes get chunk 1.
    """
    shape = list(int(s) for s in shape)
    if len(shape) == 2:
        return [min(shape[0], 2048), min(shape[1], 2048)]
    chunks = [1] * (len(shape) - 2)
    chunks += [min(shape[-2], 2048), min(shape[-1], 2048)]
    return chunks


def fused_chunks(shape: Sequence[int]) -> list[int]:
    """Chunk layout for large fused volumes (`qi2labDataStore.py:1594-1629`)."""
    shape = list(int(s) for s in shape)
    chunks = [1] * max(0, len(shape) - 3)
    tail = shape[-3:]
    if len(tail) == 3:
        chunks += [min(tail[0], 16), min(tail[1], 512), min(tail[2], 512)]
    else:
        chunks += [min(s, 512) for s in tail]
    return chunks


def _ome_axes(ndim: int, units: str = "micrometer") -> list[dict]:
    axes: list[dict] = []
    if ndim > 3:
        for i in range(ndim - 3):
            axes.append({"name": "c" if i == ndim - 4 else f"d{i}", "type": "channel"})
    for name in _SPACE_AXES[-min(ndim, 3):]:
        axes.append({"name": name, "type": "space", "unit": units})
    return axes


def _array_spec(
    path: Path,
    shape: Sequence[int],
    dtype: np.dtype,
    chunks: Sequence[int],
    *,
    compression_level: int = 1,
    cname: str = "zstd",
    shard_chunks: Sequence[int] | None = None,
) -> dict:
    """zarr3 array spec: blosc(zstd, bitshuffle), optionally wrapped in a
    ``sharding_indexed`` codec (reference
    `qi2labDataStore._create_array_tensorstore_qi2lab:1431-1536`). With
    sharding, ``shard_chunks`` is the outer shard shape and ``chunks`` the
    inner sub-chunk shape.

    Default clevel 1, not the reference's higher setting: with bitshuffle
    in front, zstd-1 compresses imaging data within ~10% of zstd-5 at
    ~4x the speed (measured 82 → 311 MB/s on a single-core host), and the
    per-tile image writes are on the pipeline's critical path (the e2e
    profile attributed 17.5 s/tile to zstd-5 compression alone)."""
    inner_codecs = [
        {"name": "bytes", "configuration": {"endian": "little"}},
        {
            "name": "blosc",
            "configuration": {
                "cname": cname,
                "clevel": int(compression_level),
                "shuffle": "bitshuffle",
                "typesize": np.dtype(dtype).itemsize,
            },
        },
    ]
    if shard_chunks is not None:
        grid_chunks = [int(c) for c in shard_chunks]
        codecs = [
            {
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": [int(c) for c in chunks],
                    "codecs": inner_codecs,
                    "index_codecs": [
                        {"name": "bytes", "configuration": {"endian": "little"}},
                        {"name": "crc32c"},
                    ],
                    "index_location": "end",
                },
            }
        ]
    else:
        grid_chunks = [int(c) for c in chunks]
        codecs = inner_codecs
    return {
        "driver": "zarr3",
        "kvstore": kvstore_spec(path),
        "metadata": {
            "shape": [int(s) for s in shape],
            "data_type": np.dtype(dtype).name,
            "chunk_grid": {
                "name": "regular",
                "configuration": {"chunk_shape": grid_chunks},
            },
            "codecs": codecs,
            "fill_value": 0,
        },
        "create": True,
        "delete_existing": True,
    }


def create_ome_image(
    path: Path | str,
    shape: Sequence[int],
    dtype: np.dtype | str,
    *,
    scale: Sequence[float] | None = None,
    translation: Sequence[float] | None = None,
    extra_attributes: Mapping[str, Any] | None = None,
    chunks: Sequence[int] | None = None,
    shard_chunks: Sequence[int] | None = None,
) -> ts.TensorStore:
    """Create an empty OME-NGFF v0.5 image group and return the writable
    level-0 TensorStore handle.

    This is the streaming write path: callers fill the array chunk by chunk
    (e.g. chunked direct-to-zarr fusion, reference
    `DataRegistration._fuse_global_registered_msims:1728-1743` where
    multiview-stitcher's ``fusion.fuse(output_zarr_url=...)`` writes each
    fused chunk straight to disk), so host memory stays bounded by one chunk
    rather than the full global volume.

    ``scale``/``translation`` follow the reference convention: only written
    when available, ordered like the array axes (zyx for 3D).
    Extra attributes are written flat into the group ``zarr.json`` attributes
    beside the ``ome`` key (reference `_write_extra_attributes`).
    """
    root = image_store_path(path)
    root.mkdir(parents=True, exist_ok=True)
    shape = [int(s) for s in shape]
    dtype = np.dtype(dtype)
    if chunks is None:
        chunks = default_chunks(shape)

    # group-level zarr.json with OME multiscales
    transforms: list[dict] = []
    ndim = len(shape)
    if scale is not None:
        s = [1.0] * (ndim - len(list(scale))) + [float(v) for v in scale]
        transforms.append({"type": "scale", "scale": s})
    else:
        transforms.append({"type": "scale", "scale": [1.0] * ndim})
    if translation is not None:
        t = [0.0] * (ndim - len(list(translation))) + [float(v) for v in translation]
        transforms.append({"type": "translation", "translation": t})

    attributes: dict[str, Any] = {
        "ome": {
            "version": "0.5",
            "multiscales": [
                {
                    "axes": _ome_axes(ndim),
                    "datasets": [
                        {"path": "0", "coordinateTransformations": transforms}
                    ],
                }
            ],
        }
    }
    if extra_attributes:
        attributes.update(_json_safe(dict(extra_attributes)))

    group_meta = {"zarr_format": 3, "node_type": "group", "attributes": attributes}
    with (root / "zarr.json").open("w", encoding="utf-8") as fh:
        json.dump(group_meta, fh, indent=2)

    return ts.open(
        _array_spec(root / "0", shape, dtype, chunks, shard_chunks=shard_chunks)
    ).result()


def write_ome_image(
    path: Path | str,
    array: np.ndarray,
    *,
    scale: Sequence[float] | None = None,
    translation: Sequence[float] | None = None,
    extra_attributes: Mapping[str, Any] | None = None,
    chunks: Sequence[int] | None = None,
    dtype: np.dtype | str | None = None,
    shard_chunks: Sequence[int] | None = None,
) -> Path:
    """Write an array as a standalone OME-NGFF v0.5 image group."""
    array = np.asarray(array)
    if dtype is not None:
        array = array.astype(dtype)
    store = create_ome_image(
        path,
        array.shape,
        array.dtype,
        scale=scale,
        translation=translation,
        extra_attributes=extra_attributes,
        chunks=chunks,
        shard_chunks=shard_chunks,
    )
    store[...] = array
    return image_store_path(path)


def open_ome_array(path: Path | str) -> ts.TensorStore:
    """Open the level-0 array of an OME image (lazy TensorStore handle)."""
    root = image_store_path(path)
    return ts.open({"driver": "zarr3", "kvstore": kvstore_spec(root / "0")}).result()


def read_ome_image(path: Path | str, return_future: bool = False):
    """Read the level-0 array; optionally return the TensorStore read future.

    Mirrors the reference's future-returning reads
    (`qi2labDataStore._load_from_zarr_array:2239-2269`) so callers can
    overlap decompression with device compute.
    """
    arr = open_ome_array(path)
    future = arr.read()
    if return_future:
        return future
    return np.asarray(future.result())


def read_image_attrs(path: Path | str) -> dict[str, Any]:
    """Read flat extra attributes from the group zarr.json (``ome`` removed)."""
    root = image_store_path(path)
    meta_path = root / "zarr.json"
    if not meta_path.exists():
        return {}
    with meta_path.open("r", encoding="utf-8") as fh:
        meta = json.load(fh)
    attrs = dict(meta.get("attributes", {}))
    attrs.pop("ome", None)
    return attrs


def write_image_attrs(
    path: Path | str, extra_attributes: Mapping[str, Any], merge: bool = True
) -> None:
    """Merge (or replace) flat extra attributes in the group zarr.json."""
    root = image_store_path(path)
    meta_path = root / "zarr.json"
    payload = _json_safe(dict(extra_attributes))
    if meta_path.exists():
        with meta_path.open("r", encoding="utf-8") as fh:
            meta = json.load(fh)
    else:
        meta = {"zarr_format": 3, "node_type": "group", "attributes": {}}
    attrs = meta.get("attributes", {})
    if not isinstance(attrs, dict):
        attrs = {}
    if merge:
        attrs.update(payload)
    else:
        ome = attrs.get("ome")
        attrs = dict(payload)
        if ome is not None:
            attrs["ome"] = ome
    meta["attributes"] = attrs
    with meta_path.open("w", encoding="utf-8") as fh:
        json.dump(meta, fh, indent=2)


def update_ome_translation(path: Path | str, translation: Sequence[float]) -> bool:
    """Rewrite the OME multiscales translation transform in place (used to
    keep the stored stage origin and the OME metadata in sync, reference
    `qi2labDataStore.py:3358-3360`). Returns False when no image exists."""
    root = image_store_path(path)
    meta_path = root / "zarr.json"
    if not meta_path.exists():
        return False
    with meta_path.open("r", encoding="utf-8") as fh:
        meta = json.load(fh)
    multiscales = meta.get("attributes", {}).get("ome", {}).get("multiscales")
    if not multiscales:
        return False
    for ms in multiscales:
        ndim = len(ms.get("axes", [])) or len(list(translation))
        t = [0.0] * (ndim - len(list(translation))) + [
            float(v) for v in translation
        ]
        for dataset in ms.get("datasets", []):
            transforms = dataset.setdefault("coordinateTransformations", [])
            for tr in transforms:
                if tr.get("type") == "translation":
                    tr["translation"] = t
                    break
            else:
                transforms.append({"type": "translation", "translation": t})
    with meta_path.open("w", encoding="utf-8") as fh:
        json.dump(meta, fh, indent=2)
    return True


def read_ome_transforms(path: Path | str) -> tuple[list[float], list[float]]:
    """Return (scale, translation) from the OME multiscales block."""
    root = image_store_path(path)
    with (root / "zarr.json").open("r", encoding="utf-8") as fh:
        meta = json.load(fh)
    ms = meta.get("attributes", {}).get("ome", {}).get("multiscales", [{}])[0]
    scale: list[float] = []
    translation: list[float] = []
    for tr in ms.get("datasets", [{}])[0].get("coordinateTransformations", []):
        if tr.get("type") == "scale":
            scale = [float(v) for v in tr["scale"]]
        elif tr.get("type") == "translation":
            translation = [float(v) for v in tr["translation"]]
    return scale, translation
