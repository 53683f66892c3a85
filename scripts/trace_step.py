import sys; sys.path.insert(0, "/root/repo")
import functools, gzip, json, collections, glob
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

@functools.partial(jax.jit, static_argnames=("c",))
def full_step(g, d, kf, R, t, c):
    f = build_frame(g, d, c)
    return tracker.track_frames(kf, f, R, t, c)

print("compiling...", flush=True)
out = full_step(g1, d1, kf, R0, t0, cfg); jax.block_until_ready(out)
print("compiled; tracing...", flush=True)
jax.profiler.start_trace("/tmp/jaxtrace_cur")
for _ in range(5):
    out = full_step(g1, d1, kf, out.R, out.t, cfg)
jax.block_until_ready(out)
jax.profiler.stop_trace()

tr = glob.glob("/tmp/jaxtrace_cur/plugins/profile/*/*.trace.json.gz")[0]
with gzip.open(tr) as f:
    data = json.load(f)
agg = collections.Counter(); cnt = collections.Counter()
for e in data.get('traceEvents', []):
    if e.get('ph') == 'X' and 'dur' in e:
        agg[e.get('name','')] += e['dur']; cnt[e.get('name','')] += 1
for name, us in agg.most_common(15):
    print(f"{us/5:9.0f} us/step x{cnt[name]/5:5.1f}  {name[:80]}", flush=True)
