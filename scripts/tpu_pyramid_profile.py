"""Per-event device-time breakdown of the production 1080^2 pyramid."""
import glob, gzip, json, os, sys
from collections import defaultdict
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from optical_flow_tpu.utils.compat import enable_persistent_cache
enable_persistent_cache()

from optical_flow_tpu import FlowConfig, coarse_to_fine
from optical_flow_tpu.ops.pyramid import max_pyramid_levels

H = W = 1080
levels = max_pyramid_levels((H, W))
cfg = FlowConfig(impl="pallas", levels=levels, mode="corrected", warp_clamp=8.0, warp_impl="auto")

def mk(seed):
    r = np.random.RandomState(seed)
    base = (r.rand(H, W) * 2040.0).astype(np.float32)
    m = (r.rand(H, W) < 0.15).astype(np.float32)
    return jnp.asarray(base * m), jnp.asarray(np.roll(base * m, 2, axis=-1))

fn = jax.jit(lambda a, b: coarse_to_fine(a, b, levels, config=cfg))
ps = [mk(s) for s in range(13)]
jax.block_until_ready(ps)
float(np.asarray(fn(*ps[0])[0][:1, :1]).ravel()[0])
td = "/tmp/pyr_profile"
os.system(f"rm -rf {td}")
with jax.profiler.trace(td):
    outs = [fn(*p) for p in ps[1:]]
    float(np.asarray(outs[-1][0][:1, :1]).ravel()[0])

files = glob.glob(td + "/**/*.trace.json.gz", recursive=True)
agg = defaultdict(lambda: [0.0, 0])
longname = {}
jit_total = 0.0
jit_calls = 0
with gzip.open(files[0]) as f:
    tr = json.load(f)
for e in tr.get("traceEvents", []):
    if e.get("ph") != "X":
        continue
    n = e.get("name", "")
    d = e.get("dur", 0)
    if n.startswith("jit_"):
        jit_total += d
        jit_calls += 1
        continue
    # device op-level events live under the XLA Ops track
    if e.get("args", {}).get("long_name") or "fusion" in n or "copy" in n or "custom" in n:
        agg[n][0] += d
        agg[n][1] += 1
        ln = e.get("args", {}).get("long_name")
        if ln:
            longname[n] = ln
print(f"jit total: {jit_total/max(jit_calls,1)/1e3:.3f} ms/frame over {jit_calls} calls")
rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
tot = sum(v[0] for v in agg.values())
print(f"op-event coverage: {tot/max(jit_total,1)*100:.0f}% of jit span")
for n, (d, c) in rows[:40]:
    print(f"{d/12/1e3:8.4f} ms  x{c:4d}  {n[:24]:24s} {longname.get(n, '')[:140]}")
import re
cls = defaultdict(float)
for n, (d, c) in agg.items():
    cls[re.sub(r"[.\d]+$", "", n)] += d
print("--- by class (ms/frame) ---")
for n, d in sorted(cls.items(), key=lambda kv: -kv[1]):
    print(f"{d/12/1e3:8.4f}  {n}")
