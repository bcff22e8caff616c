"""Cell segmentation (mirrors reference
`examples/zhuang_lab/03_cellpose_segmentation.py`).

Run Cellpose externally on the fused fiducial max projection, then import
the mask; or use the classical fallback segmentation."""

from pathlib import Path

from merfish3d_tpu import qi2labDataStore
from merfish3d_tpu.pipeline.segmentation import segment_fiducial

DATASTORE = Path("/data/mop/qi2labdatastore")
MASK = Path("/data/mop/cellpose_mask.npy")  # external Cellpose output

if __name__ == "__main__":
    datastore = qi2labDataStore(DATASTORE, validate=False)
    segment_fiducial(
        datastore, mask_path=MASK if MASK.exists() else None
    )
