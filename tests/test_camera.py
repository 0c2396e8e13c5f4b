import numpy as np

from clive2_tpu.camera import Camera, tone_map


def test_camera_basis_orthonormal():
    cam = Camera(
        center=np.array([0, 1.5, 6.0]),
        direction=np.array([0, 0, -1.0]),
        pixel_width=64,
        pixel_height=32,
        phys_width=2.0,
        phys_height=1.0,
    )
    assert abs(np.dot(cam.dx, cam.dy)) < 1e-9
    assert abs(np.linalg.norm(cam.dx) - 1) < 1e-9
    assert abs(np.linalg.norm(cam.dy) - 1) < 1e-9


def test_focal_point_in_front():
    cam = Camera(direction=np.array([0, 0, -1.0]), phys_width=16 / 9.0)
    fp = cam.focal_point
    assert np.dot(fp - cam.center, cam.direction) > 0


def test_diagonal_direction_basis():
    cam = Camera(direction=np.array([-1, 0, -1.0]) / np.sqrt(2))
    # dx orthogonal to the viewing direction's horizontal projection
    assert abs(np.dot(cam.dx, cam.direction)) < 1e-9


def test_tone_map_range_and_monotonic():
    img = np.abs(np.random.default_rng(0).normal(size=(8, 8, 3))).astype(np.float32)
    out = tone_map(img, exposure=4.0)
    assert out.dtype == np.uint8
    assert out.min() >= 0 and out.max() <= 255
    # doubling radiance cannot reduce mapped value
    out2 = tone_map(img * 2, exposure=4.0)
    assert out2.mean() >= out.mean() - 1
