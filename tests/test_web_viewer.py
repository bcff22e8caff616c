"""Self-contained HTML viewer export (`viz/web.py`).

Validates the serialized payload against the stub datastore the viewer
data-layer tests use, the embedded-document integrity (extractable JSON,
script-close escaping), downsampling bookkeeping, and the localhost
server round-trip."""

import base64
import json
import urllib.request
from pathlib import Path

import numpy as np

from test_viewer_layer import _StubStore

from merfish3d_tpu.viz.web import (
    GENE_COLORS,
    build_payload,
    export_html,
    serve,
)


def _payload_from_html(path: Path) -> dict:
    doc = Path(path).read_text()
    marker = '<script id="m3d-payload" type="application/json">'
    start = doc.index(marker) + len(marker)
    end = doc.index("</script>", start)
    return json.loads(doc[start:end])


def _stub(tmp_path) -> _StubStore:
    ds = _StubStore(tmp_path)
    ds.datastore_state["Fused"] = True  # expose the global fused view
    return ds


def test_payload_structure(tmp_path):
    ds = _stub(tmp_path)
    payload = build_payload(ds)
    names = [v["name"] for v in payload["views"]]
    assert names == ["tile0000", "tile0001", "global"]

    tile = payload["views"][0]
    # fiducial + 2 bits (registered; no feature-predictor images in stub)
    assert [c["label"] for c in tile["channels"]] == [
        "round001:fiducial", "bit001:decon", "bit002:decon",
    ]
    z, y, x = tile["channels"][0]["shape"]
    raw = base64.b64decode(tile["channels"][0]["b64"])
    assert len(raw) == z * y * x
    assert tile["channels"][0]["lo"] < tile["channels"][0]["hi"]
    assert tile["downsample"] == 1
    assert tile["spacing_zyx_um"] == [0.31, 0.098, 0.098]

    # spots restricted per tile by tile_idx; genes carry fixed colors
    assert [s[3] for s in tile["spots"]] == ["a"]
    assert [s[3] for s in payload["views"][1]["spots"]] == ["b"]
    assert payload["gene_counts"] == {"a": 1, "b": 1}
    assert payload["gene_colors"]["a"] == GENE_COLORS[0]
    assert payload["gene_colors"]["b"] == GENE_COLORS[1]

    # outlines mapped into pixel coordinates (identity affine, µm spacing)
    assert len(tile["outlines"]) == 1
    yx = np.asarray(tile["outlines"][0]["yx"])
    np.testing.assert_allclose(
        yx[0], [0.1 / 0.098, 0.1 / 0.098], atol=0.02
    )

    # the global view converts filtered-spot µm to fused-canvas px
    gview = payload["views"][2]
    assert gview["name"] == "global"
    assert len(gview["spots"]) == 2
    np.testing.assert_allclose(
        gview["spots"][0][1:3], [0.5 / 0.098, 0.2 / 0.098], atol=0.02
    )


def test_downsampling_keeps_fullres_coordinates(tmp_path):
    ds = _stub(tmp_path)
    payload = build_payload(ds, max_edge=4)
    tile = payload["views"][0]
    assert tile["downsample"] == 2
    assert tile["channels"][0]["shape"][1:] == [4, 4]
    assert tile["shape_zyx"][1:] == [8, 8]  # full-res, for readouts
    assert tile["spots"][0][1:3] == [3.0, 4.0]  # untouched tile px


def test_export_html_document(tmp_path):
    ds = _stub(tmp_path)
    out = export_html(ds, tmp_path / "viewer.html")
    doc = out.read_text()
    assert "<canvas" in doc and "m3d-payload" in doc
    payload = _payload_from_html(out)
    assert len(payload["views"]) == 3
    # JSON inside <script> must not be able to close the tag early
    marker = '<script id="m3d-payload" type="application/json">'
    body = doc[doc.index(marker) + len(marker):]
    assert "</script>" in body  # the real close exists...
    assert "</" not in body[: body.index("</script>")]  # ...and nothing before it


def test_serve_roundtrip(tmp_path):
    ds = _stub(tmp_path)
    out = export_html(ds, tmp_path / "viewer.html")
    server = serve(out, port=0, block=False)
    try:
        port = server.server_address[1]
        fetched = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ).read()
        assert fetched == out.read_bytes()
    finally:
        server.shutdown()
        server.server_close()


def test_gene_overflow_folds_to_other(tmp_path):
    import pandas as pd

    ds = _stub(tmp_path)
    genes = [f"g{i:02d}" for i in range(10)]
    ds.spots = pd.DataFrame(
        {
            "tile_z": np.ones(10),
            "tile_y": np.ones(10),
            "tile_x": np.ones(10),
            "global_y": np.ones(10) * 0.5,
            "global_x": np.ones(10) * 0.5,
            "gene_id": genes,
            "tile_idx": np.zeros(10, int),
        }
    )
    payload = build_payload(ds)
    assert len(payload["gene_colors"]) == 8  # 9th/10th fold to Other
    assert set(payload["gene_colors"]).issubset(set(genes))
    assert payload["other_gene_color"]
