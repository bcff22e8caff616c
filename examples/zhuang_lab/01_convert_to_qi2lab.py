"""Convert downloaded Zhuang-lab MOp raw data into a qi2lab datastore
(mirrors reference `examples/zhuang_lab/01_convert_to_qi2lab.py`).

Expects the raw data re-exported into the generic raw layout
(per-tile stacks + metadata.json + codebook.csv + exp_order.csv)."""

from pathlib import Path

from merfish3d_tpu.cli.qi2lab.create_datastore import create_datastore

RAW_DIR = Path("/data/mop/raw")
OUTPUT_DIR = Path("/data/mop")

if __name__ == "__main__":
    create_datastore(RAW_DIR, OUTPUT_DIR)
