"""RectifyProcessor: device remap output must match cv2.remap with the same
cached maps (mono undistort and stereo rectification paths)."""
import numpy as np

from lpslam_tpu.pipeline.config import CameraConfig
from lpslam_tpu.pipeline.rectify import RectifyProcessor
from lpslam_tpu.pipeline.queues import CameraQueueEntry
from lpslam_tpu.io.synthetic import make_texture


def test_mono_undistort_matches_cv2():
    import cv2

    h, w = 120, 160
    cam = CameraConfig(
        number=0, model="perspective",
        fx=140.0, fy=140.0, cx=w / 2, cy=h / 2,
        distortion=np.asarray([-0.25, 0.06, 0.0, 0.0, 0.0], np.float32),
        width=w, height=h,
    )
    proc = RectifyProcessor(camera=cam)
    img = make_texture(h, w, seed=7)
    out = proc.process_image(CameraQueueEntry(timestamp=0, image=img.copy()))

    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    ref = cv2.undistort(img, K, cam.distortion.astype(np.float64))
    # interior comparison (border extrapolation differs)
    inner = (slice(10, -10), slice(10, -10))
    assert np.abs(out.image[inner] - ref[inner]).mean() < 2.0


def test_stereo_rectify_runs():
    h, w = 120, 160
    left_cfg = CameraConfig(
        number=0, model="perspective",
        fx=140.0, fy=140.0, cx=w / 2, cy=h / 2,
        distortion=np.asarray([-0.2, 0.04, 0, 0, 0], np.float64),
        width=w, height=h,
        rotation=np.eye(3),
        translation=np.asarray([-0.1, 0.0, 0.0]),
    )
    right_cfg = CameraConfig(
        number=1, model="perspective",
        fx=141.0, fy=141.0, cx=w / 2 + 1, cy=h / 2 - 1,
        distortion=np.asarray([-0.21, 0.05, 0, 0, 0], np.float64),
        width=w, height=h,
    )
    proc = RectifyProcessor(camera=left_cfg, camera_right=right_cfg)
    assert proc.focal_x_baseline > 0
    img = make_texture(h, w, seed=8)
    entry = CameraQueueEntry(timestamp=0, image=img.copy(), image_second=img.copy())
    out = proc.process_image(entry)
    assert out.image.shape == (h, w)
    assert out.image_second.shape == (h, w)
    assert np.isfinite(out.image).all()
