"""Probe: photometric-corruption break points per dimension (VERDICT r2
item 2).  Sweeps each intensity-channel corruption independently on the
box scene at 160x120 and reports ATE + lost count; also measures Canny
-threshold sensitivity under the combined sensor profile (the reference
tunes 150/100 per dataset, camerapyr.h:40-41).

    timeout 1200 python scripts/probes/photo_break.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "tests"))

from revo_tpu.eval import absolute_trajectory_error
from revo_tpu.io.synthetic import box_scene, render_sequence
from revo_tpu.system import VOSystem

from test_solver import small_cfg

N_FRAMES = 30
SEED = 3


def run(cfg, scene):
    vo = VOSystem(cfg)
    est, gt = [], []
    for gray, depth, T, ts in render_sequence(
        scene, cfg.camera, N_FRAMES, seed=SEED
    ):
        est.append(vo.process_frame(gray, depth, ts))
        gt.append(T)
    ate = absolute_trajectory_error(np.stack(est), np.stack(gt))
    return ate.rmse, vo.n_tracking_lost


def main():
    cfg = small_cfg()
    t0 = time.time()
    sweeps = {
        "image_noise": [0.0, 2.0, 4.0, 8.0, 12.0, 16.0],
        "image_blur": [0.5, 1.0, 1.5, 2.0],
        "exposure_drift": [0.05, 0.1, 0.2],
        "vignette": [0.2, 0.4],
        "shot_noise": [4.0, 8.0, 16.0],
    }
    for key, values in sweeps.items():
        for v in values:
            scene = box_scene(**{key: v})
            rmse, lost = run(cfg, scene)
            print(
                f"{key}={v:<5} ATE={rmse * 100:6.3f} cm lost={lost} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )

    profile = dict(
        image_noise=3.0, shot_noise=4.0, image_blur=0.5,
        exposure_drift=0.05, vignette=0.25,
    )
    rmse, lost = run(cfg, box_scene(**profile))
    print(f"combined profile ATE={rmse * 100:6.3f} cm lost={lost}", flush=True)

    # Canny-threshold sensitivity under the combined profile.
    for t1, t2 in [(150, 100), (100, 50), (200, 150), (60, 30)]:
        c = dataclasses.replace(
            cfg,
            pyramid=dataclasses.replace(
                cfg.pyramid, canny_threshold1=t1, canny_threshold2=t2
            ),
        )
        rmse, lost = run(c, box_scene(**profile))
        print(
            f"canny=({t1},{t2}) combined ATE={rmse * 100:6.3f} cm lost={lost}",
            flush=True,
        )


if __name__ == "__main__":
    main()
