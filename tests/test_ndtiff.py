"""NDTiff reader/writer round-trip + qi2lab microscope raw-layout conversion
(reference `cli/qi2lab_microscopes/create_datastore.py`)."""

import numpy as np
import pandas as pd
import pytest

from merfish3d_tpu.utils.ndtiff import (
    NDTiffDataset,
    NDTiffWriter,
    read_ndtiff_stack,
    write_ndtiff,
)

CHANNELS = ["F-Blue", "F-Yellow", "F-Red"]


def _plane_metadata(x_um, y_um, z_step_um=0.31):
    def fn(channel, z):
        return {
            "Camera-CameraName": "C13440-20CU",
            "Camera-CONVERSION FACTOR COEFF": 0.46,
            "Camera-CONVERSION FACTOR OFFSET": 100.0,
            "Camera-Binning": "2x2",
            "XYStage-TransposeMirrorX": 0,
            "XYStage-TransposeMirrorY": 0,
            "PixelSizeUm": 0.098,
            "PixelSizeAffine": "0.098;0.0;0.0;0.0;0.098;0.0",
            "XPosition_um_Intended": x_um,
            "YPosition_um_Intended": y_um,
            "ZPosition_um_Intended": z * z_step_um,
        }

    return fn


def test_ndtiff_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    stack = rng.integers(0, 2**16, (3, 4, 16, 20), dtype=np.uint16)
    path = write_ndtiff(
        tmp_path / "acq_1", stack, channels=CHANNELS,
        metadata_fn=_plane_metadata(12.5, -3.0),
    )
    ds = NDTiffDataset(path)

    coords = ds.get_image_coordinates_list()
    assert len(coords) == 12
    assert coords[0] == {"channel": "F-Blue", "z": 0}

    np.testing.assert_array_equal(
        ds.read_image(channel="F-Yellow", z=2), stack[1, 2]
    )
    md = ds.read_metadata(channel="F-Blue", z=0)
    assert md["Camera-CameraName"] == "C13440-20CU"
    assert md["XPosition_um_Intended"] == 12.5
    md1 = ds.read_metadata(channel="F-Blue", z=1)
    assert md1["ZPosition_um_Intended"] == pytest.approx(0.31)

    assert ds.axis_values("channel") == CHANNELS
    np.testing.assert_array_equal(ds.as_array(), stack)
    np.testing.assert_array_equal(read_ndtiff_stack(path), stack)

    # the stack file is a valid classic TIFF (magic + first IFD pointer)
    raw = (path / f"{path.name}_NDTiffStack.tif").read_bytes()
    assert raw[:4] == b"II*\x00"
    first_ifd = int.from_bytes(raw[4:8], "little")
    assert 0 < first_ifd < len(raw)


def test_ndtiff_uint8_and_missing_axes(tmp_path):
    with NDTiffWriter(tmp_path / "u8_1") as w:
        w.put(np.arange(12, dtype=np.uint8).reshape(3, 4), {"channel": 0, "z": 0})
    ds = NDTiffDataset(tmp_path / "u8_1")
    img = ds.read_image(channel=0, z=0)
    assert img.dtype == np.uint8
    np.testing.assert_array_equal(img, np.arange(12).reshape(3, 4))
    with pytest.raises(KeyError):
        ds.read_image(channel=1, z=0)


def _make_qi2lab_raw(root, n_rounds=2, n_tiles=2, n_z=3, yx=24, vignette=False):
    """Synthetic qi2lab-microscope acquisition: scan_metadata.csv +
    codebook/bit_order CSVs + one NDTiff dir per round/tile.
    ``vignette=True`` multiplies every plane by a shared radial
    illumination falloff (for the flatfield-pass test)."""
    rng = np.random.default_rng(7)
    root.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(
        [{
            "root_name": "exp", "num_r": n_rounds, "num_xyz": n_tiles,
            "num_ch": 3, "blue_active": True, "yellow_active": True,
            "red_active": True, "z_step_um": 0.31, "yx_pixel_um": 0.098,
            "na": 1.35, "ri": 1.51, "experiment_type": "3D",
            "tile_overlap": 0.2, "channels_reversed": False,
        }]
    ).to_csv(root / "scan_metadata.csv", index=False)

    n_bits = 2 * n_rounds
    words = np.zeros((3, n_bits), int)
    for g in range(3):
        words[g, [g % n_bits, (g + 1) % n_bits]] = 1
    codebook = pd.DataFrame(
        [[f"gene_{chr(97 + g)}", *words[g]] for g in range(3)],
        columns=["gene_id"] + [f"bit{i:02d}" for i in range(1, n_bits + 1)],
    )
    codebook.to_csv(root / "codebook.csv", index=False)
    bit_order = pd.DataFrame(
        [[r + 1, 2 * r + 1, 2 * r + 2] for r in range(n_rounds)],
        columns=["round", "yellow", "red"],
    )
    bit_order.to_csv(root / "bit_order.csv", index=False)

    field = None
    if vignette:
        vy, vx = np.meshgrid(
            np.linspace(-1, 1, yx), np.linspace(-1, 1, yx), indexing="ij"
        )
        field = 1.0 - 0.45 * (vy**2 + vx**2)

    stacks = {}
    for r in range(n_rounds):
        for t in range(n_tiles):
            stack = rng.integers(50, 4000, (3, n_z, yx, yx), dtype=np.uint16)
            if field is not None:
                stack = (
                    100.0 + (stack.astype(np.float32) - 100.0) * field
                ).clip(0, 65535).astype(np.uint16)
            stacks[(r, t)] = stack
            write_ndtiff(
                root / f"exp_r{r + 1:04d}_tile{t:04d}_1",
                stack,
                channels=CHANNELS,
                metadata_fn=_plane_metadata(x_um=100.0 * t, y_um=50.0 * t),
            )
    return stacks


def test_qi2lab_ndtiff_conversion(tmp_path):
    from merfish3d_tpu.cli.qi2lab.create_datastore import create_datastore_qi2lab

    root = tmp_path / "raw"
    stacks = _make_qi2lab_raw(root)
    # flatfield off: the assertions below pin EXACT gain-corrected values
    ds = create_datastore_qi2lab(
        root, noise_map_shape_yx=(24, 24), apply_flatfield=False
    )

    assert ds.num_rounds == 2
    assert ds.num_tiles == 2
    assert ds.camera_model == "orcav3"
    assert ds.e_per_ADU == pytest.approx(0.46)
    assert ds.binning == 2  # parsed from NDTiff "2x2"
    assert ds.microscope_type == "3D"
    np.testing.assert_allclose(ds.voxel_size_zyx_um, [0.31, 0.098, 0.098])
    assert len(ds.channel_psfs) == 3
    assert ds.datastore_state["Corrected"]

    # gain/offset correction applied: (raw - 100) * 0.46, clipped at 0
    expected = np.clip(
        (stacks[(0, 0)].astype(np.float32) - 100.0) * 0.46, 0, 2**16 - 1
    ).astype(np.uint16)
    np.testing.assert_array_equal(
        ds.load_local_corrected_image(tile=0, round=0), expected[0]
    )
    # readout channels land on bits via bit_order: round 2 red channel → bit 4
    np.testing.assert_array_equal(
        ds.load_local_corrected_image(tile=1, bit=3),
        np.clip((stacks[(1, 1)].astype(np.float32) - 100.0) * 0.46,
                0, 2**16 - 1).astype(np.uint16)[2],
    )

    stage, affine = ds.load_local_stage_position_zyx_um(tile=1, round=0)
    np.testing.assert_allclose(np.asarray(stage), [0.0, 50.0, 100.0])
    np.testing.assert_allclose(np.diag(affine), [1.0, 1.0, 1.0, 1.0])

    ex, em = ds.load_local_wavelengths_um(tile=0, bit=0)
    assert (ex, em) == pytest.approx((0.561, 0.580))

    # codebook round-trips through the datastore
    cb = ds.codebook
    assert list(cb["gene_id"]) == ["gene_a", "gene_b", "gene_c"]


def test_qi2lab_layout_autodetect_via_cli(tmp_path):
    from merfish3d_tpu.cli.qi2lab.create_datastore import main
    from merfish3d_tpu.datastore import qi2labDataStore

    root = tmp_path / "raw"
    _make_qi2lab_raw(root, n_rounds=1, n_tiles=1)
    out = tmp_path / "store"
    main(["--raw-dir", str(root), "--output-dir", str(out)])
    ds = qi2labDataStore(out / "qi2labdatastore")
    assert ds.num_tiles == 1 and ds.camera_model == "orcav3"


def test_qi2lab_flatfield_pass(tmp_path):
    """The default conversion estimates BaSiC flatfields from sampled
    tiles and divides them out (reference `create_datastore.py:600-710`,
    `use_illuminations=False`): a strong synthetic vignette must be gone
    from the stored corrected images, and the shading flag recorded."""
    import json

    from merfish3d_tpu.cli.qi2lab.create_datastore import create_datastore_qi2lab

    root = tmp_path / "raw"
    _make_qi2lab_raw(root, vignette=True)
    ds = create_datastore_qi2lab(root, noise_map_shape_yx=(24, 24))

    def corner_to_center(img):
        prof = np.asarray(img, np.float32).mean(axis=0)
        return prof[:5, :5].mean() / prof[9:15, 9:15].mean()

    # applied vignette: corner/center ≈ 0.12 before correction
    for where in (dict(round=0), dict(bit=0)):
        ratio = corner_to_center(ds.load_local_corrected_image(tile=0, **where))
        assert ratio > 0.55, (where, ratio)

    flagged = False
    for pth in ds.datastore_path.rglob("*.json"):
        try:
            text = pth.read_text()
        except OSError:
            continue
        if '"shading_correction"' in text and "true" in text.lower():
            flagged = True
            break
    assert flagged, "no corrected image records shading_correction=true"
