"""Compile the batched step, save HLO text, print exact-name op definitions.

    timeout 590 python scripts/hlo_batch.py fusion.16 fusion.15 fusion.14
"""
import sys; sys.path.insert(0, "/root/repo")
import dataclasses, re
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
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
frames = list(render_sequence(SyntheticScene(), cfg.camera, 2, seed=0))
g1 = frames[1][0].astype(np.uint8)
d1 = (frames[1][1] * 5000).astype(np.uint16)
f0 = build_frame(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), cfg_b)
kf = make_keyframe(f0, jnp.eye(4), cfg_b)

B = 8
def step(g, d, k, R, t):
    f = build_frame(g, d, cfg_b)
    return tracker.track_frames(k, f, R, t, cfg_b)

vstep = jax.jit(jax.vmap(step))
gb = jnp.stack([jnp.asarray(g1)] * B)
db = jnp.stack([jnp.asarray(d1)] * B)
kfb = jax.tree.map(lambda x: jnp.stack([x] * B), kf)
Rb = jnp.stack([jnp.eye(3)] * B)
tb = jnp.stack([jnp.zeros(3)] * B)

print("compiling...", flush=True)
txt = vstep.lower(gb, db, kfb, Rb, tb).compile().as_text()
open("/tmp/hlo_batch.txt", "w").write(txt)
print(f"HLO saved: /tmp/hlo_batch.txt ({len(txt)/1e6:.1f} MB)", flush=True)

for name in sys.argv[1:] or ["fusion.16", "fusion.15", "fusion.14",
                             "fusion.370"]:
    pat = re.compile(rf"(ROOT\s+)?%{re.escape(name)} = ")
    for line in txt.splitlines():
        if pat.search(line):
            print(f"\n== {name} ==\n{line[:1200]}", flush=True)
            break
