"""Trace the FULL-SYSTEM scan step (vo_scan: build + track + voting +
promotion cond) per-HLO on TPU — the deployment path, unlike trace_step's
track-only step.

    timeout 590 python scripts/trace_scan.py [n_frames]
"""
import sys; sys.path.insert(0, "/root/repo")
import collections, glob, gzip, json, re, tempfile, time

import jax
import jax.numpy as jnp
import numpy as np

from revo_tpu.config import SystemConfig
from revo_tpu.io.synthetic import SyntheticScene, render_sequence
from revo_tpu.parallel.batch import vo_scan

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = SystemConfig()
frames = list(render_sequence(SyntheticScene(), cfg.camera, N, seed=0))
grays = jnp.asarray(np.stack([f[0] for f in frames]))
depths = jnp.asarray(np.stack([f[1] for f in frames]))

fn = jax.jit(lambda g, d: vo_scan(g, d, cfg)[0])
print("compiling...", flush=True)
compiled = fn.lower(grays, depths).compile()
attr = {}
for line in compiled.as_text().splitlines():
    m = re.match(r"\s*(?:ROOT\s+)?%([\w.\-]+)\s*=", line)
    if not m:
        continue
    src = re.search(r'source_file="([^"]*)"[^"]*source_line=(\d+)', line)
    attr[m.group(1)] = (
        f"{src.group(1).split('/')[-1]}:{src.group(2)}" if src else ""
    )

poses = fn(grays, depths)
jax.block_until_ready(poses)
t0 = time.perf_counter()
reps = 5
for _ in range(reps):
    poses = fn(grays, depths)
jax.block_until_ready(poses)
per_frame = (time.perf_counter() - t0) / reps / (N - 1) * 1e3
print(f"scan VO: {per_frame:.2f} ms/frame ({1e3 / per_frame:.1f} fps)",
      flush=True)

td = tempfile.mkdtemp(prefix="scantrace_")
jax.profiler.start_trace(td)
for _ in range(reps):
    poses = fn(grays, depths)
jax.block_until_ready(poses)
jax.profiler.stop_trace()
evs, cnt = collections.Counter(), collections.Counter()
for p in glob.glob(td + "/**/*.trace.json.gz", recursive=True):
    tr = json.load(gzip.open(p))
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur", 0) > 0 and "args" in e:
            evs[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
denom = reps * (N - 1)
for nm, us in evs.most_common(30):
    print(
        f"{us / denom:9.0f} us/frame x {cnt[nm] / denom:5.1f}  "
        f"{nm:40s} {attr.get(nm, '')}",
        flush=True,
    )
