"""qi2lab-bulkseq: decoded counts vs bulk-seq FPKM correlation QC
(mirrors `cli/qi2lab_microscopes/bulkseq_correlation.py:137-268`:
log-log Pearson of per-gene decoded counts against reference FPKM)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import pandas as pd


def bulkseq_correlation(
    decoded: pd.DataFrame,
    fpkm: pd.DataFrame,
    *,
    gene_column: str = "gene_id",
    fpkm_gene_column: str = "gene",
    fpkm_value_column: str = "FPKM",
    pseudocount: float = 1.0,
) -> dict:
    """Per-gene decoded counts vs FPKM log-log Pearson correlation."""
    counts = (
        decoded[~decoded[gene_column].astype(str).str.lower().str.startswith("blank")]
        .groupby(gene_column)
        .size()
    )
    fpkm_map = fpkm.set_index(fpkm_gene_column)[fpkm_value_column]
    genes = sorted(set(counts.index) & set(fpkm_map.index))
    if len(genes) < 3:
        return {"n_genes": len(genes), "pearson_r": np.nan}
    x = np.log10(fpkm_map.loc[genes].to_numpy(dtype=float) + pseudocount)
    y = np.log10(counts.loc[genes].to_numpy(dtype=float) + pseudocount)
    r = float(np.corrcoef(x, y)[0, 1])
    return {"n_genes": len(genes), "pearson_r": r}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="qi2lab-bulkseq")
    p.add_argument("--datastore-path", required=True, type=Path)
    p.add_argument("--fpkm-csv", required=True, type=Path)
    p.add_argument("--fpkm-gene-column", type=str, default="gene")
    p.add_argument("--fpkm-value-column", type=str, default="FPKM")
    p.add_argument("--output", type=Path, default=None)
    args = p.parse_args(argv)

    from ...datastore import qi2labDataStore

    ds = qi2labDataStore(args.datastore_path, validate=False)
    decoded = ds.load_global_filtered_decoded_spots()
    if decoded is None:
        raise SystemExit("no filtered decoded spots found; run qi2lab-decode first")
    fpkm = pd.read_csv(args.fpkm_csv)
    result = bulkseq_correlation(
        decoded, fpkm,
        fpkm_gene_column=args.fpkm_gene_column,
        fpkm_value_column=args.fpkm_value_column,
    )
    print(json.dumps(result, indent=2))
    if args.output:
        args.output.write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
