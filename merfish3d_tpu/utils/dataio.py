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
