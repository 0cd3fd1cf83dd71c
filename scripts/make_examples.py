"""Generate the docs/ example montage: source | foveated | restored for
log-rectilinear, plus the log-polar baseline — on a synthetic 1080p frame
with high-frequency content so the foveation falloff is visible.

Run: PYTHONPATH=. python scripts/make_examples.py
"""

import numpy as np
import cv2
import jax.numpy as jnp

from foveax.config import FoveaxConfig
from foveax.core import (
    make_logpolar_grid,
    logpolar_gaussian_blur,
    sample_logpolar,
    unwarp_logpolar,
)
from foveax.io.video import SyntheticReader
from foveax.pipeline.frames import FoveationPipeline


def label(img, text):
    img = np.ascontiguousarray(img[:, :, ::-1])
    cv2.putText(
        img, text, (12, 34), cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 0, 0), 5
    )
    cv2.putText(
        img, text, (12, 34), cv2.FONT_HERSHEY_SIMPLEX, 1.0, (255, 255, 255), 2
    )
    return img[:, :, ::-1]


def main():
    cfg = FoveaxConfig()
    reader = SyntheticReader(cfg.source_width, cfg.source_height, n_frames=40)
    for _ in range(30):
        frame = reader.read()
    gaze = (0.62, 0.45)

    p = FoveationPipeline(cfg)
    c = p.center(*gaze)
    fj = jnp.asarray(frame)
    reduced, restored = p.roundtrip(fj, c)

    g = make_logpolar_grid(
        cfg.reduced_width, cfg.reduced_height, cfg.source_width, cfg.source_height
    )
    lp = logpolar_gaussian_blur(sample_logpolar(fj, g, c))
    lp_restored = unwarp_logpolar(lp, cfg.source_width, cfg.source_height, c)

    # Mark the gaze on the source.
    src = np.asarray(frame).copy()
    gx, gy = int(gaze[0] * cfg.source_width), int(gaze[1] * cfg.source_height)
    src_bgr = np.ascontiguousarray(src[:, :, ::-1])
    cv2.circle(src_bgr, (gx, gy), 24, (0, 255, 0), 3)
    src = src_bgr[:, :, ::-1]

    def half(x):
        return cv2.resize(np.asarray(x), (960, 540), interpolation=cv2.INTER_AREA)

    red_vis = cv2.resize(
        np.asarray(reduced), (960, 540), interpolation=cv2.INTER_NEAREST
    )
    top = np.concatenate(
        [label(half(src), "source 1080p (gaze circled)"),
         label(red_vis, "transmitted 1072x608 (log-rectilinear)")],
        axis=1,
    )
    bottom = np.concatenate(
        [label(half(restored), "restored (log-rectilinear unwarp)"),
         label(half(lp_restored), "restored (log-polar baseline)")],
        axis=1,
    )
    montage = np.concatenate([top, bottom], axis=0)
    cv2.imwrite(
        "docs/example_montage.jpg",
        montage[:, :, ::-1],
        [cv2.IMWRITE_JPEG_QUALITY, 85],
    )
    print("wrote docs/example_montage.jpg", montage.shape)


if __name__ == "__main__":
    import pathlib

    pathlib.Path("docs").mkdir(exist_ok=True)
    main()
