"""Trace the single-seq build+track step per-HLO on TPU, with source
attribution from the compiled HLO metadata.

    timeout 590 python scripts/trace_step.py
"""
import sys; sys.path.insert(0, "/root/repo")
import functools, gzip, json, collections, glob, re
import jax, jax.numpy as jnp
import numpy as np
from revo_tpu import tracker
from revo_tpu.frontend import build_frame, make_keyframe
from revo_tpu.config import SystemConfig
from revo_tpu.io.synthetic import SyntheticScene, render_sequence

cfg = SystemConfig()
frames = list(render_sequence(SyntheticScene(), cfg.camera, 3, seed=0))
g1 = jax.device_put(frames[1][0].astype(np.uint8))
d1 = jax.device_put((frames[1][1]*5000).astype(np.uint16))
f0 = build_frame(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), cfg)
kf = make_keyframe(f0, jnp.eye(4), cfg); jax.block_until_ready(kf.structs)
R0 = jax.device_put(jnp.eye(3)); t0 = jax.device_put(jnp.zeros(3))

def step(g, d, k, R, t):
    f = build_frame(g, d, cfg)
    return tracker.track_frames(k, f, R, t, cfg)

jstep = jax.jit(step)
print("compiling...", flush=True)
hlo = jstep.lower(g1, d1, kf, R0, t0).compile().as_text()
open("/tmp/hlo_step.txt", "w").write(hlo)
attr = {}
for line in hlo.splitlines():
    m = re.match(r"\s*(?:ROOT\s+)?%([\w.\-]+)\s*=", line)
    if not m:
        continue
    op = re.search(r'op_name="([^"]*)"', line)
    src = re.search(r'source_file="([^"]*)"[^"]*source_line=(\d+)', line)
    attr[m.group(1)] = (
        (op.group(1) if op else ""),
        (f"{src.group(1).split('/')[-1]}:{src.group(2)}" if src else ""),
    )

out = jstep(g1, d1, kf, R0, t0); jax.block_until_ready(out)
import time
t0_ = time.perf_counter()
N = 20
for _ in range(N):
    out = jstep(g1, d1, kf, out.R, out.t)
jax.block_until_ready(out)
print(f"step: {(time.perf_counter()-t0_)/N*1e3:.2f} ms", flush=True)

import tempfile
trace_dir = tempfile.mkdtemp(prefix="jaxtrace_step_")
jax.profiler.start_trace(trace_dir)
for _ in range(N):
    out = jstep(g1, d1, kf, out.R, out.t)
jax.block_until_ready(out)
jax.profiler.stop_trace()

tr = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")[0]
with gzip.open(tr) as f:
    data = json.load(f)
agg = collections.Counter(); cnt = collections.Counter()
for e in data.get('traceEvents', []):
    if e.get('ph') == 'X' and 'dur' in e:
        agg[e.get('name','')] += e['dur']; cnt[e.get('name','')] += 1
for name, us in agg.most_common(30):
    op, src = attr.get(name, ("", ""))
    print(f"{us/N:8.0f} us/step x{cnt[name]/N:5.1f}  {name[:40]:40s} "
          f"{src:26s} {op[-64:]}", flush=True)
