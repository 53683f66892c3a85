import sys; sys.path.insert(0, "/root/repo")
import dataclasses, functools, gzip, json, collections, glob
import jax, jax.numpy as jnp
import numpy as np
from revo_tpu import tracker
from revo_tpu.frontend import build_frame, make_keyframe
from revo_tpu.config import SystemConfig
from revo_tpu.io.synthetic import SyntheticScene, render_sequence

cfg = SystemConfig()
cfg_b = dataclasses.replace(
    cfg,
    tracker=dataclasses.replace(
        cfg.tracker,
        optimizer=dataclasses.replace(cfg.tracker.optimizer, solver="gn_fixed"),
    ),
)
frames = list(render_sequence(SyntheticScene(), cfg.camera, 3, seed=0))
g1 = frames[1][0].astype(np.uint8)
d1 = (frames[1][1] * 5000).astype(np.uint16)
f0 = build_frame(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), cfg)
kf = make_keyframe(f0, jnp.eye(4), cfg); jax.block_until_ready(kf.structs)

B = 8
@functools.partial(jax.jit, static_argnames=("c",))
def step(g, d, kf, R, t, c):
    f = build_frame(g, d, c)
    return tracker.track_frames(kf, f, R, t, c)

vstep = jax.jit(jax.vmap(lambda g, d, k, R, t: step(g, d, k, R, t, cfg_b)))
gb = jnp.stack([jnp.asarray(g1)] * B)
db = jnp.stack([jnp.asarray(d1)] * B)
kfb = jax.tree.map(lambda x: jnp.stack([x] * B), kf)
Rb = jnp.stack([jnp.eye(3)] * B)
tb = jnp.stack([jnp.zeros(3)] * B)

print("compiling...", flush=True)
out = vstep(gb, db, kfb, Rb, tb); jax.block_until_ready(out)
import time
t0 = time.perf_counter()
N = 5
for _ in range(N):
    out = vstep(gb, db, kfb, out.R, out.t)
jax.block_until_ready(out)
print(f"batched step: {(time.perf_counter()-t0)/N*1e3:.1f} ms  "
      f"(agg {B*N/(time.perf_counter()-t0):.1f} fps)", flush=True)

import os, shutil, tempfile
trace_dir = tempfile.mkdtemp(prefix="jaxtrace_batch_")
jax.profiler.start_trace(trace_dir)
for _ in range(N):
    out = vstep(gb, db, kfb, out.R, out.t)
jax.block_until_ready(out)
jax.profiler.stop_trace()

tr = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")[0]
with gzip.open(tr) as f:
    data = json.load(f)
agg = collections.Counter(); cnt = collections.Counter()
for e in data.get('traceEvents', []):
    if e.get('ph') == 'X' and 'dur' in e:
        agg[e.get('name','')] += e['dur']; cnt[e.get('name','')] += 1
for name, us in agg.most_common(25):
    print(f"{us/N:9.0f} us/step x{cnt[name]/N:5.1f}  {name[:90]}", flush=True)
