"""qi2lab-bulkseq: decoded counts vs bulk-seq FPKM correlation QC
(mirrors `cli/qi2lab_microscopes/bulkseq_correlation.py:29-268`: flexible
table loaders, gene-name normalization, log-log Pearson of per-gene
decoded counts against reference FPKM, optional scatter figure)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import pandas as pd


def load_table(path: Path, sep: str | None = None) -> pd.DataFrame:
    """CSV/TSV/TXT loader with separator sniffing (reference
    `_load_file1/_load_file2_txt:29-106`)."""
    path = Path(path)
    if sep is None:
        head = path.read_text(encoding="utf-8", errors="replace")[:4096]
        sep = "\t" if head.count("\t") > head.count(",") else ","
    return pd.read_csv(path, sep=sep)


def normalize_gene_names(
    s: pd.Series,
    *,
    drop_prefixes: tuple[str, ...] = (),
    strip_trailing_dash_number: bool = False,
) -> pd.Series:
    """Gene-name cleanup: drop configured prefixes (e.g. probe-set tags)
    and trailing ``-N`` suffixes (reference `_drop_gene_prefixes:108-122`,
    `_strip_trailing_dash_number:124-135`)."""
    out = s.astype(str)
    for prefix in drop_prefixes:
        out = out.str.removeprefix(prefix)
    if strip_trailing_dash_number:
        out = out.str.replace(r"-\d+$", "", regex=True)
    return out


def bulkseq_correlation(
    decoded: pd.DataFrame,
    fpkm: pd.DataFrame,
    *,
    gene_column: str = "gene_id",
    fpkm_gene_column: str = "gene",
    fpkm_value_column: str = "FPKM",
    pseudocount: float = 1.0,
    drop_prefixes: tuple[str, ...] = (),
    strip_trailing_dash_number: bool = False,
) -> dict:
    """Per-gene decoded counts vs FPKM log-log Pearson correlation
    (reference `_counts_vs_fpkm:137-245`,
    `_pearson_loglog_x_fpkm_y_counts:247-267`)."""
    names = normalize_gene_names(
        decoded[gene_column],
        drop_prefixes=drop_prefixes,
        strip_trailing_dash_number=strip_trailing_dash_number,
    )
    keep = ~names.str.lower().str.startswith("blank")
    counts = names[keep].groupby(names[keep]).size()
    fpkm_names = normalize_gene_names(
        fpkm[fpkm_gene_column],
        drop_prefixes=drop_prefixes,
        strip_trailing_dash_number=strip_trailing_dash_number,
    )
    fpkm_map = pd.Series(
        fpkm[fpkm_value_column].to_numpy(), index=fpkm_names
    ).groupby(level=0).mean()
    genes = sorted(set(counts.index) & set(fpkm_map.index))
    if len(genes) < 3:
        return {"n_genes": len(genes), "pearson_r": float("nan"), "genes": genes}
    x = np.log10(fpkm_map.loc[genes].to_numpy(dtype=float) + pseudocount)
    y = np.log10(counts.loc[genes].to_numpy(dtype=float) + pseudocount)
    r = float(np.corrcoef(x, y)[0, 1])
    return {
        "n_genes": len(genes),
        "pearson_r": r,
        "log_fpkm": x.tolist(),
        "log_counts": y.tolist(),
        "genes": genes,
    }


def write_scatter(result: dict, output_png: Path) -> None:
    """Log-log counts-vs-FPKM scatter with the Pearson r annotated
    (the reference renders the same QC figure)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 5))
    ax.scatter(result["log_fpkm"], result["log_counts"], s=14, alpha=0.7)
    ax.set_xlabel("log10(FPKM + 1)")
    ax.set_ylabel("log10(decoded counts + 1)")
    ax.set_title(
        f"counts vs bulk FPKM — r = {result['pearson_r']:.3f} "
        f"(n = {result['n_genes']})"
    )
    fig.tight_layout()
    fig.savefig(output_png, dpi=150)
    plt.close(fig)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="qi2lab-bulkseq")
    p.add_argument("--datastore-path", required=True, type=Path)
    p.add_argument("--fpkm-csv", required=True, type=Path)
    p.add_argument("--fpkm-gene-column", type=str, default="gene")
    p.add_argument("--fpkm-value-column", type=str, default="FPKM")
    p.add_argument("--sep", type=str, default=None)
    p.add_argument("--drop-gene-prefixes", type=str, nargs="*", default=())
    p.add_argument(
        "--strip-trailing-dash-number",
        action=argparse.BooleanOptionalAction,
        default=False,
    )
    p.add_argument("--figure", type=Path, default=None)
    p.add_argument("--output", type=Path, default=None)
    args = p.parse_args(argv)

    from ...datastore import qi2labDataStore

    ds = qi2labDataStore(args.datastore_path, validate=False)
    decoded = ds.load_global_filtered_decoded_spots()
    if decoded is None:
        raise SystemExit("no filtered decoded spots found; run qi2lab-decode first")
    fpkm = load_table(args.fpkm_csv, sep=args.sep)
    result = bulkseq_correlation(
        decoded,
        fpkm,
        fpkm_gene_column=args.fpkm_gene_column,
        fpkm_value_column=args.fpkm_value_column,
        drop_prefixes=tuple(args.drop_gene_prefixes),
        strip_trailing_dash_number=args.strip_trailing_dash_number,
    )
    summary = {k: result[k] for k in ("n_genes", "pearson_r")}
    print(json.dumps(summary, indent=2))
    if args.figure:
        write_scatter(result, args.figure)
    if args.output:
        args.output.write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
