"""F1 score of decoded spots against MERLIN reference positions (mirrors
reference `examples/zhuang_lab/05_calculate_f1_score.py`)."""

import json
from pathlib import Path

import pandas as pd

from merfish3d_tpu import qi2labDataStore
from merfish3d_tpu.cli.simulation.calculate_f1 import match_spots_f1

DATASTORE = Path("/data/mop/qi2labdatastore")
MERLIN_SPOTS = Path("/data/mop/merlin_spots.csv")

if __name__ == "__main__":
    datastore = qi2labDataStore(DATASTORE, validate=False)
    decoded = datastore.load_global_filtered_decoded_spots()
    merlin = pd.read_csv(MERLIN_SPOTS)
    result = match_spots_f1(decoded, merlin, radius_um=1.0)
    print(json.dumps(result, indent=2))
