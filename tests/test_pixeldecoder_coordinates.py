"""Pure unit test of the pixel→global coordinate chain (mirrors reference
`tests/test_pixeldecoder_coordinates.py:6`): the camera-to-stage affine is
applied BEFORE the global affine."""

import numpy as np

from merfish3d_tpu.pipeline.decoder import PixelDecoder


def test_warp_pixel_applies_camera_affine_before_global():
    decoder = PixelDecoder.__new__(PixelDecoder)
    spacing = np.array([0.31, 0.098, 0.098])
    origin = np.array([10.0, 20.0, 30.0])
    camera = np.eye(4)
    camera[1, 1] = -1.0  # y-flip camera orientation
    camera[1, 3] = 5.0
    global_affine = np.eye(4)
    global_affine[:3, 3] = [1.0, 2.0, 3.0]
    state = {
        "z_crop_offset": 0,
        "spacing": spacing,
        "origin": origin,
        "affine": global_affine,
        "camera_to_stage_affine": camera,
    }
    pts = np.array([[2.0, 4.0, 6.0]])
    out = decoder._warp_pixels(pts, state)

    physical = pts[0] * spacing + origin
    staged = (camera @ np.append(physical, 1.0))[:3]
    expected = (global_affine @ np.append(staged, 1.0))[:3]
    np.testing.assert_allclose(out[0], expected, rtol=1e-12)

    # the wrong order (global before camera) must NOT match
    wrong = (camera @ np.append((global_affine @ np.append(physical, 1.0))[:3], 1.0))[:3]
    assert not np.allclose(out[0], wrong)
