"""Exhaustive-mode sweep coverage (VERDICT r3 #10): a real decode-parameter
grid × {DoG, trained CNN} predictors on a matrix case, with the
multi-case figure pinned structurally — growing toward the reference's
9-model × 5-threshold × 12-case grid (`/root/reference/README.md:139-324`)
within hermetic runtime budgets. Opt-in via --run-f1-exhaustive."""

import json
from pathlib import Path

import pytest

CKPT = Path(__file__).parent / "data" / "ufish_synthetic_c8.pkl"


def _build_case(workdir: Path, ufish_checkpoint):
    from merfish3d_tpu.cli.simulation import (
        convert_simulation_to_experiment as sim_convert,
    )
    from merfish3d_tpu.cli.simulation import convert_to_datastore as sim_datastore
    from merfish3d_tpu.pipeline.registration import DataRegistration

    raw = workdir / "raw"
    sim_convert.write_raw_experiment(
        raw,
        shape=(12, 96, 96),
        n_spots=60,
        n_genes=20,
        n_blanks=4,
        seed=11,
        voxel_size_zyx_um=(0.315, 0.098, 0.098),
        distribution="cells",
        axial_sigma_um=0.44,
    )
    ds = sim_datastore.convert_data(raw, workdir)
    DataRegistration(
        ds,
        decon_fiducial=False,
        decon_readout=False,
        global_registration=True,
        verbose=0,
        ufish_model="dog" if ufish_checkpoint is None else "synthetic-cnn",
        ufish_checkpoint=ufish_checkpoint,
    ).register_all_tiles()
    return raw, ds


@pytest.mark.parametrize("predictor", ["dog", "cnn"])
def test_sweep_grid_per_predictor(tmp_path, request, predictor):
    if not request.config.getoption("--run-f1-exhaustive"):
        pytest.skip("exhaustive mode: pass --run-f1-exhaustive")
    from merfish3d_tpu.cli.simulation.sweep_f1 import sweep

    raw, ds = _build_case(
        tmp_path, None if predictor == "dog" else CKPT
    )
    result = sweep(
        ds.datastore_path,
        raw / "GT_spots.csv",
        magnitude_lows=(0.7, 0.9),
        minimum_pixels_grid=(3, 4),
        feature_predictor_thresholds=(0.1,),
        output_csv=tmp_path / "sweep.csv",
        results_json=tmp_path / "decode_params_results.json",
        optimize_tiles=1,
        optimize_iterations=1,
        verbose=0,
    )
    assert len(result) == 4  # full grid, no fatal points
    assert "error" not in result.columns or result["error"].isna().all()
    assert result["f1"].between(0.0, 1.0).all()
    # the well-tuned corner must be strong for both predictors
    assert result["f1"].max() >= 0.85, result.to_dict("records")
    points = json.loads((tmp_path / "decode_params_results.json").read_text())
    assert len(points) == 4  # incremental checkpoint covered the grid


def test_build_figure_multi_case_structure(tmp_path, request):
    if not request.config.getoption("--run-f1-exhaustive"):
        pytest.skip("exhaustive mode: pass --run-f1-exhaustive")
    from merfish3d_tpu.cli.simulation.build_figure import build_matrix_figure
    from merfish3d_tpu.cli.simulation.pixeldecode import decode_pixels

    cases = []
    for i, name in enumerate(["caseA", "caseB"]):
        wd = tmp_path / name
        raw, ds = _build_case(wd, None)
        decode_pixels(
            ds.datastore_path,
            minimum_pixels=4,
            magnitude_threshold=(0.9, 10.0),
            num_tiles=1,
            num_iterations=1,
        )
        case = tmp_path / f"panel_{name}"
        case.mkdir()
        (case / "raw").symlink_to(raw)
        (case / "qi2labdatastore").symlink_to(ds.datastore_path)
        cases.append(case)
    png = tmp_path / "matrix.png"
    build_matrix_figure(cases, png, labels=["case A", "case B"])
    # structural pin: a real multi-panel raster, larger than any
    # single-panel render of the same data
    assert png.exists() and png.stat().st_size > 10000
