"""Data I/O utilities (reference `utils/dataio.py:1-207`): CSV metadata
readers, stack loaders (npy / multipage TIFF via PIL; tifffile/NDTIFF are
not available in this environment), and the sparse MTX writer for
cell-by-gene matrices."""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np
import pandas as pd


def read_metadatafile(path: Union[str, Path]) -> dict:
    """Key/value CSV metadata reader (reference `read_metadatafile`)."""
    df = pd.read_csv(path)
    if df.shape[0] == 1:
        return {col: df[col].iloc[0] for col in df.columns}
    return dict(zip(df.iloc[:, 0], df.iloc[:, 1]))


def read_config_file(path: Union[str, Path]) -> dict:
    return read_metadatafile(path)


def load_stack(path: Union[str, Path]) -> np.ndarray:
    """Load a 3D stack from .npy or multipage .tif (PIL)."""
    path = Path(path)
    if path.suffix == ".npy":
        return np.load(path)
    from PIL import Image

    img = Image.open(path)
    frames = []
    for i in range(getattr(img, "n_frames", 1)):
        img.seek(i)
        frames.append(np.asarray(img))
    return np.stack(frames)


def write_metadata(data_dict: dict, save_path: Union[str, Path]) -> None:
    """Write a metadata dictionary as a one-row CSV (reference
    `utils/dataio.py:97-108`)."""
    pd.DataFrame([data_dict]).to_csv(save_path)


def write_tsv(filename: Union[str, Path], data) -> None:
    """Write rows (strings or sequences of strings) as TSV (reference
    `utils/dataio.py:193-207`)."""
    import csv

    with open(filename, "w", newline="") as fh:
        writer = csv.writer(fh, delimiter="\t", lineterminator="\n")
        for item in data:
            writer.writerow([item] if isinstance(item, str) else item)


def time_stamp() -> str:
    """Human-readable timestamp for progress logging (reference
    `utils/dataio.py:144-153`)."""
    from datetime import datetime

    return datetime.now().strftime("%Y-%m-%d %H:%M:%S")


def return_data_zarr(
    dataset_path: Union[str, Path], ch_idx: int, ch_idx_offset: int = 0
) -> np.ndarray:
    """Return one channel of an NDTiff acquisition as (z, y, x) uint16
    (reference `utils/dataio.py:111-141`, which goes through
    ``tifffile.imread(aszarr=True)``; here the NDTiff index fast path)."""
    from .ndtiff import NDTiffDataset

    dataset_path = Path(dataset_path)
    if dataset_path.is_file():  # *_NDTiffStack.tif → containing dataset dir
        dataset_path = dataset_path.parent
    stack = NDTiffDataset(dataset_path).as_array()
    return np.squeeze(stack[ch_idx + ch_idx_offset]).astype(np.uint16)


def write_sparse_mtx(
    counts: pd.DataFrame, output_dir: Union[str, Path]
) -> Path:
    """Cell-by-gene counts → MatrixMarket sparse triplet + barcodes/features
    TSVs (reference `write_sparse_mtx`). ``counts`` rows = cells (indexed by
    cell_id), columns = gene ids."""
    import gzip

    import scipy.io
    import scipy.sparse

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    sparse = scipy.sparse.csr_matrix(counts.to_numpy())
    scipy.io.mmwrite(output_dir / "matrix.mtx", sparse.T)
    with gzip.open(output_dir / "barcodes.tsv.gz", "wt") as fh:
        for cell in counts.index:
            fh.write(f"cell_{cell}\n")
    with gzip.open(output_dir / "features.tsv.gz", "wt") as fh:
        for gene in counts.columns:
            fh.write(f"{gene}\t{gene}\tGene Expression\n")
    return output_dir


def cell_by_gene_counts(decoded: pd.DataFrame) -> pd.DataFrame:
    """Build the cell-by-gene count matrix from the filtered decoded table
    (rows with cell_id >= 0; blanks excluded)."""
    df = decoded[
        (decoded.get("cell_id", -1) >= 0)
        & ~decoded["gene_id"].astype(str).str.lower().str.startswith("blank")
    ]
    return (
        df.groupby(["cell_id", "gene_id"]).size().unstack(fill_value=0).sort_index()
    )
