"""Register + deconvolve + predict all tiles (mirrors reference
`examples/zhuang_lab/02_register_and_deconvolve.py`)."""

from pathlib import Path

from merfish3d_tpu import DataRegistration, qi2labDataStore

DATASTORE = Path("/data/mop/qi2labdatastore")

if __name__ == "__main__":
    datastore = qi2labDataStore(DATASTORE)
    registration = DataRegistration(
        datastore,
        decon_fiducial=True,
        decon_readout=True,
        deformable_registration=True,
        global_registration=True,
    )
    registration.register_all_tiles()
