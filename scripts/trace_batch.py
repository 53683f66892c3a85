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

# op name -> (op_name metadata, source) for exact-name attribution.
# Fusions whose own line carries no metadata inherit the majority source
# of their called computation's member ops (e.g. the compaction
# block-locator scatters: the scatter op inside %fused_computation.N has
# backproject.py metadata, the %fusion.N call line has none).
attr = {}
fusion_calls = {}
comp_srcs = collections.defaultdict(collections.Counter)
cur_comp = None
for line in hlo.splitlines():
    mc = re.match(r"%([\w.\-]+) \(", line)
    if mc:
        cur_comp = mc.group(1)
    m = re.match(r"\s*(?:ROOT\s+)?%([\w.\-]+)\s*=", line)
    if not m:
        continue
    op = re.search(r'op_name="([^"]*)"', line)
    src = re.search(r'source_file="([^"]*)"[^"]*source_line=(\d+)', line)
    src_s = f"{src.group(1).split('/')[-1]}:{src.group(2)}" if src else ""
    attr[m.group(1)] = ((op.group(1) if op else ""), src_s)
    call = re.search(r"calls=%([\w.\-]+)", line)
    if call:
        fusion_calls[m.group(1)] = call.group(1)
    if cur_comp and src_s:
        comp_srcs[cur_comp][src_s.split(":")[0]] += 1
for name, (op, src) in list(attr.items()):
    if not op and not src and name in fusion_calls:
        members = comp_srcs.get(fusion_calls[name])
        if members:
            attr[name] = ("", members.most_common(1)[0][0] + ":body")

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
# Restrict to the DEVICE op track: host-side python/profiler events would
# otherwise pollute the attribution (process metadata names the tracks).
procs, tids = {}, {}
for e in data.get('traceEvents', []):
    if e.get('ph') == 'M' and e.get('name') == 'process_name':
        procs[e['pid']] = e['args'].get('name', '')
    if e.get('ph') == 'M' and e.get('name') == 'thread_name':
        tids[(e['pid'], e.get('tid'))] = e['args'].get('name', '')
dev_pids = {p for p, n in procs.items() if '/device' in n.lower()}
agg = collections.Counter(); cnt = collections.Counter()
module_us = 0
for e in data.get('traceEvents', []):
    if e.get('ph') != 'X' or 'dur' not in e or e.get('pid') not in dev_pids:
        continue
    th = tids.get((e['pid'], e.get('tid')), '')
    if th == 'XLA Modules':
        module_us += e['dur']  # whole-executable spans: the true step time
        continue
    if th != 'XLA Ops':
        continue
    agg[e.get('name','')] += e['dur']; cnt[e.get('name','')] += 1
for name, us in agg.most_common(60):
    op, src = attr.get(name, ("", ""))
    print(f"{us/N:9.0f} us/step x{cnt[name]/N:5.1f}  {name[:40]:40s} "
          f"{src:28s} {op[-70:]}", flush=True)


# ---- COMPLETE bucketed attribution (VERDICT r4 #2): every trace event is
# classified, so the buckets + residual sum to the step total by
# construction — "levers exhausted" becomes checkable arithmetic instead
# of a claim about the named subset.
def bucket_of(name, op, src):
    s = (src or "").lower()
    o = (op or "").lower()
    n = name.lower()
    if "canny" in s or "canny" in o:
        return "canny (Pallas)"
    if n.startswith("sort") or (o and "sort" in o.split("/")[-1]):
        return "lane sorts (rank_sort2)"
    if "backproject" in s:
        return "compaction/backproject"
    if "interp" in s or "quad" in o:
        return "solver row gathers (interp)"
    if "solver" in s:
        return "solver body (residual/NE/LM)"
    if "edge_hist" in s:
        return "edge-hist fill-in"
    if "depth" in s or "filters" in s:
        return "depth/filters pyramids"
    if "tracker" in s:
        return "tracker (init-check/voting)"
    if "lie" in s:
        return "lie products"
    if n.startswith(("copy", "reshape", "transpose", "bitcast")):
        return "layout copies/reshapes"
    if n.startswith(("dynamic-update-slice", "dynamic_update")):
        return "carry updates"
    if n.startswith(("fusion", "loop_", "wide_param", "input_fusion")):
        return "unattributed fusions"
    if n.startswith(("while", "conditional", "tuple", "parameter",
                     "get-tuple", "copy-start", "copy-done", "infeed",
                     "outfeed", "all-reduce", "bitcast")):
        return "control/transfer"
    return "other"


buckets = collections.Counter()
bucket_members = collections.defaultdict(collections.Counter)
total_us = 0
container_us = 0
for name, us in agg.items():
    # while/conditional spans CONTAIN their body ops — counting both
    # double-books the body; report them separately as structure overhead
    # (span minus the children that appear as their own events).
    if name.split('.')[0] in ("while", "conditional"):
        container_us += us
        continue
    op, src = attr.get(name, ("", ""))
    b = bucket_of(name, op, src)
    buckets[b] += us
    bucket_members[b][name] += us
    total_us += us
print(f"\n==== bucketed attribution (device 'XLA Ops' track) ====",
      flush=True)
print(f"{'bucket':38s} {'ms/step':>8s}  top members", flush=True)
for b, us in buckets.most_common():
    tops = ", ".join(
        f"{n.split('.')[0]}:{u/N/1000:.2f}"
        for n, u in bucket_members[b].most_common(3)
    )
    print(f"{b:38s} {us/N/1000:8.2f}  {tops}", flush=True)
print(f"{'SUM of leaf ops':38s} {total_us/N/1000:8.2f}", flush=True)
print(f"{'while/cond container spans':38s} {container_us/N/1000:8.2f}"
      f"  (contain the in-loop ops above; overlap, not additive)",
      flush=True)
print(f"{'XLA Modules (true step total)':38s} {module_us/N/1000:8.2f}",
      flush=True)
print(f"unaccounted (module - leaf sum): "
      f"{(module_us-total_us)/N/1000:.2f} ms/step (scheduling gaps + "
      f"container overhead)", flush=True)
resid = buckets.get("unattributed fusions", 0) + buckets.get("other", 0)
print(f"residual (unattributed+other): {resid/N/1000:.2f} ms/step",
      flush=True)
if resid / N / 1000 > 0.3:
    print("-- residual members (name the largest):", flush=True)
    for b in ("unattributed fusions", "other"):
        for n, u in bucket_members.get(b, collections.Counter()).most_common(12):
            op, src = attr.get(n, ("", ""))
            print(f"   {u/N:8.0f} us/step  {n[:44]:44s} {src:24s} "
                  f"{op[-60:]}", flush=True)
