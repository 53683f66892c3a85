"""A/B: per-frame capacity bucketing (tracker.track_frames_bucketed) vs
full-capacity tracking in the host-dispatch mode, on TPU.

Wall per-call through the tunnel is noisy (2-4 ms/dispatch), so this also
reports the solve-only time with pre-built frames (build once, track many)
where the bucket effect is purest.

    timeout 580 python scripts/probes/ab_bucket.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

from revo_tpu import tracker
from revo_tpu.autotune import calibrate_capacities
from revo_tpu.config import SystemConfig
from revo_tpu.frontend import build_frame, make_keyframe
from revo_tpu.io.synthetic import SyntheticScene, render_sequence

N = 4


def main():
    base = SystemConfig()
    cache = f"/tmp/frames_{base.camera.width}x{base.camera.height}_{N+1}_s0.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        frames = [(z[f"g{i}"], z[f"d{i}"]) for i in range(N + 1)]
    else:
        frames = [
            (f[0], f[1])
            for f in render_sequence(SyntheticScene(), base.camera, N + 1,
                                     seed=0)
        ]
        np.savez(
            cache,
            **{f"g{i}": f[0] for i, f in enumerate(frames)},
            **{f"d{i}": f[1] for i, f in enumerate(frames)},
        )
    # Generous margin so per-frame fill is ~0.7-0.8 and buckets bite.
    cfg = calibrate_capacities(
        base, [frames[0][0]], [frames[0][1]], margin=1.3
    )
    print(f"caps={cfg.pyramid.edge_capacity}", flush=True)
    f0 = build_frame(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), cfg)
    kf = make_keyframe(f0, jnp.eye(4), cfg)
    built = [
        build_frame(jnp.asarray(g), jnp.asarray(d), cfg) for g, d in frames[1:]
    ]
    jax.block_until_ready(built)
    for fr in built:
        counts = [int(lv.cloud.count) for lv in fr.levels]
        caps = [lv.cloud.points.shape[0] for lv in fr.levels]
        print(
            "fill:",
            [round(c / p, 3) for c, p in zip(counts, caps)],
            "->", tracker.pick_buckets(counts, caps),
            flush=True,
        )

    R0, t0 = jnp.eye(3), jnp.zeros(3)

    from bench import hard_sync

    def timeit(fn, label, reps=24, frames=None):
        frames = built if frames is None else frames
        r = fn(frames[0])
        hard_sync(r.error)
        for fr in frames:  # compile all bucket variants
            hard_sync(fn(fr).error)
        t = time.perf_counter()
        for i in range(reps):
            r = fn(frames[i % N])
        hard_sync(r.error)  # fetch-sync: block_until_ready can no-op
        ms = (time.perf_counter() - t) / reps * 1e3
        print(f"{label:28s} {ms:7.3f} ms/track (err {float(r.error):.4f})",
              flush=True)
        return ms

    full = timeit(
        lambda fr: tracker.track_frames(kf, fr, R0, t0, cfg), "full capacity"
    )
    buck = timeit(
        lambda fr: tracker.track_frames_bucketed(kf, fr, R0, t0, cfg),
        "bucketed (count sync/call)",
    )
    # Pre-picked buckets: isolates the device-side saving from the count
    # -fetch round trips (a real host pays microseconds for those; the
    # tunnel pays ~2 ms x 3 levels per call).
    sliced = [
        tracker.slice_cloud_frame(
            fr,
            tracker.pick_buckets(
                [int(lv.cloud.count) for lv in fr.levels],
                [lv.cloud.points.shape[0] for lv in fr.levels],
            ),
        )
        for fr in built
    ]
    pre = timeit(
        lambda fr: tracker._track_sliced(kf, fr, R0, t0, cfg),
        "bucketed (pre-picked)", frames=sliced,
    )
    print(
        f"tunnel speedup {full / buck:.3f}x; device-side {full / pre:.3f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
