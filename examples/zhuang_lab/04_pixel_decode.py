"""Self-optimizing pixel decoding (mirrors reference
`examples/zhuang_lab/04_pixel_decode.py`)."""

from pathlib import Path

from merfish3d_tpu import PixelDecoder, qi2labDataStore

DATASTORE = Path("/data/mop/qi2labdatastore")

if __name__ == "__main__":
    datastore = qi2labDataStore(DATASTORE, validate=False)
    decoder = PixelDecoder(
        datastore,
        merfish_bits=16,
        minimum_pixels=16,
        magnitude_threshold=(1.5, 10.0),
    )
    decoder.optimize_normalization_by_decoding(
        n_random_tiles=20, n_iterations=5
    )
    decoder.decode_all_tiles(assign_to_cells=True)
