"""Trace the batched (vmapped B=8) build+track step per-HLO on TPU, and map
the hottest ops back to revo_tpu source lines via the compiled HLO metadata.

    timeout 590 python scripts/trace_batch.py [quad_form]
"""
import sys; sys.path.insert(0, "/root/repo")
import dataclasses, functools, gzip, json, collections, glob, re
import jax, jax.numpy as jnp
import numpy as np
from revo_tpu import tracker
from revo_tpu.frontend import build_frame, make_keyframe
from revo_tpu.config import SystemConfig
from revo_tpu.io.synthetic import SyntheticScene, render_sequence

FORM = sys.argv[1] if len(sys.argv) > 1 else "dt4bf"
cfg = SystemConfig()
cfg_b = dataclasses.replace(
    cfg,
    tracker=dataclasses.replace(
        cfg.tracker,
        optimizer=dataclasses.replace(
            cfg.tracker.optimizer, solver="gn_fixed", quad_form=FORM
        ),
    ),
)
import os
_ls = os.environ.get("LANE_SELECT")
if _ls:
    cfg_b = dataclasses.replace(
        cfg_b,
        tracker=dataclasses.replace(
            cfg_b.tracker,
            optimizer=dataclasses.replace(
                cfg_b.tracker.optimizer, lane_select=_ls
            ),
        ),
    )
    print(f"LANE_SELECT={_ls}", flush=True)
_comp = os.environ.get("COMPACTION")
if _comp:
    cfg_b = dataclasses.replace(
        cfg_b, pyramid=dataclasses.replace(cfg_b.pyramid, compaction=_comp)
    )
    print(f"COMPACTION={_comp}", flush=True)
_proj = os.environ.get("PROJ_IMPL")
if _proj:
    cfg_b = dataclasses.replace(
        cfg_b,
        tracker=dataclasses.replace(
            cfg_b.tracker,
            optimizer=dataclasses.replace(
                cfg_b.tracker.optimizer, proj_impl=_proj
            ),
        ),
    )
    print(f"PROJ_IMPL={_proj}", flush=True)
_cap = float(os.environ.get("CAP_SCALE", "0"))
frames = list(render_sequence(SyntheticScene(), cfg.camera, 3, seed=0))
if _cap > 0:
    from revo_tpu.autotune import calibrate_capacities

    cfg_b = calibrate_capacities(
        cfg_b, [frames[0][0]], [frames[0][1]], margin=_cap
    )
    print(f"CAP_SCALE={_cap} caps={cfg_b.pyramid.edge_capacity}", flush=True)
cfg = cfg_b
g1 = frames[1][0].astype(np.uint8)
d1 = (frames[1][1] * 5000).astype(np.uint16)
f0 = build_frame(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), cfg_b)
kf = make_keyframe(f0, jnp.eye(4), cfg_b)
jax.block_until_ready(kf.structs)

B = int(os.environ.get("TRACE_B", "8"))
def step(g, d, k, R, t):
    f = build_frame(g, d, cfg_b)
    return tracker.track_frames(k, f, R, t, cfg_b)

vstep = jax.jit(jax.vmap(step))
gb = jnp.stack([jnp.asarray(g1)] * B)
db = jnp.stack([jnp.asarray(d1)] * B)
kfb = jax.tree.map(lambda x: jnp.stack([x] * B), kf)
Rb = jnp.stack([jnp.eye(3)] * B)
tb = jnp.stack([jnp.zeros(3)] * B)

print(f"compiling (quad_form={FORM})...", flush=True)
compiled = vstep.lower(gb, db, kfb, Rb, tb).compile()
hlo = compiled.as_text()

# op name -> (op_name metadata, source) for exact-name attribution
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

out = vstep(gb, db, kfb, Rb, tb)
_ = float(np.asarray(out.error).ravel()[0])  # fetch-sync
import time
t0 = time.perf_counter()
N = 5
for _ in range(N):
    out = vstep(gb, db, kfb, out.R, out.t)
_ = float(np.asarray(out.error).ravel()[0])  # fetch-sync
print(f"batched step: {(time.perf_counter()-t0)/N*1e3:.1f} ms  "
      f"(agg {B*N/(time.perf_counter()-t0):.1f} fps)", flush=True)

import tempfile
trace_dir = tempfile.mkdtemp(prefix="jaxtrace_batch_")
jax.profiler.start_trace(trace_dir)
for _ in range(N):
    out = vstep(gb, db, kfb, out.R, out.t)
_ = float(np.asarray(out.error).ravel()[0])  # fetch-sync
jax.profiler.stop_trace()

tr = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")[0]
with gzip.open(tr) as f:
    data = json.load(f)
agg = collections.Counter(); cnt = collections.Counter()
for e in data.get('traceEvents', []):
    if e.get('ph') == 'X' and 'dur' in e:
        agg[e.get('name','')] += e['dur']; cnt[e.get('name','')] += 1
for name, us in agg.most_common(60):
    op, src = attr.get(name, ("", ""))
    print(f"{us/N:9.0f} us/step x{cnt[name]/N:5.1f}  {name[:40]:40s} "
          f"{src:28s} {op[-70:]}", flush=True)
