"""Lane-fold A/B probe on the batch bench workload (32x5s, 512/128, 100
sweeps), fresh subprocess per case, bench mixture class.

Cases pair each production mode with its lane-folded variant
(ops/pallas_packed.tiled_lws_sweeps' lane_fold): at F=257 one group costs
3 x 128-lane tiles per vector op, two folded groups cost 5, four cost 9
(vs 12) — outputs are bit-equal, so any wall delta is pure tile-padding
recovery. Run the list twice and compare within the same session block
(tunnel drift rule, CLAUDE.md).
"""
import os
import subprocess
import sys

INNER = r'''
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "lws_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2.0")
import time, numpy as np
import jax, jax.numpy as jnp
from lws_tpu import LWS, get_thresholds
kw = %KW%
rng = np.random.default_rng(0)
t = np.arange(80000) / 16000.0
xs = []
for i in range(32):
    f0 = 120 + 40 * (i % 8)
    xs.append(0.5*np.sin(2*np.pi*f0*2*t) + 0.3*np.sin(2*np.pi*(f0*4.7)*t + 0.3*i)
              + 0.2*np.sin(2*np.pi*(300+3000*t/t[-1])*t) + 0.05*rng.standard_normal(t.size))
x = np.stack(xs).astype(np.float32)
proc = LWS(1024, 256, **kw) if "%MODE%".startswith("f513") else LWS(512, 128, **kw)
sr, si = proc.stft_ri(x)
amp = jnp.sqrt(sr*sr + si*si)
pair = (amp, jnp.zeros_like(amp))
thr = jnp.asarray(get_thresholds(100, 100, 0.1, 1), dtype=proc.rdtype)
probe = jax.jit(lambda o: o.ravel()[-1].astype(jnp.float32))
t0 = time.time()
out = proc._batch_fn(*pair, thresholds=thr)
float(probe(out[0]))
compile_s = time.time() - t0
walls = []
for r in range(5):
    eps = 1.0 + 1e-6*(r+1)
    fr = (amp*eps, jnp.zeros_like(amp))
    jax.block_until_ready(fr)
    t0 = time.time()
    out = proc._batch_fn(*fr, thresholds=thr)
    float(probe(out[0]))
    walls.append(time.time()-t0)
c = float(np.asarray(proc.get_consistency(out)).mean())
w = float(np.median(walls))
print(f"RESULT wall={w*1e3:.0f}ms rate={160.0/w:.0f} cons={c:.3f} compile={compile_s:.0f}s plan={proc._plan_tiled(pair)}")
'''

CASES = {
    "f513-serving-f1": 'dict(inner_passes=1, pallas_unroll=-1, pallas_window="rows", pallas_fold=1)',
    "f513-serving-f4": 'dict(inner_passes=1, pallas_unroll=-1, pallas_window="rows", pallas_pack=8, pallas_fold=4)',
    "serving-f1": 'dict(inner_passes=1, pallas_unroll=-1, pallas_window="rows", pallas_fold=1)',
    "serving-f2": 'dict(inner_passes=1, pallas_unroll=-1, pallas_window="rows", pallas_fold=2)',
    "serving-f4": 'dict(inner_passes=1, pallas_unroll=-1, pallas_window="rows", pallas_pack=8, pallas_fold=4)',
    "direct-f1": 'dict(inner_passes=1, pallas_window="direct", pallas_pack=32, pallas_fold=1)',
    "direct-f2": 'dict(inner_passes=1, pallas_window="direct", pallas_pack=16, pallas_fold=2)',
    "direct-f4": 'dict(inner_passes=1, pallas_window="direct", pallas_pack=8, pallas_fold=4)',
    "hq-f1": 'dict(pallas_fold=1)',
    "hq-f4": 'dict(pallas_pack=8, pallas_fold=4)',
    "hq-serving": 'dict(pallas_unroll=-1, pallas_window="rows")',
}


def main():
    names = sys.argv[1:] or list(CASES)
    unknown = [n for n in names if n not in CASES]
    if unknown:
        sys.exit(f"unknown case(s) {unknown}; available: {sorted(CASES)}")
    for name in names:
        code = INNER.replace("%KW%", CASES[name]).replace("%MODE%", name)
        p = subprocess.run([sys.executable, "-c", code], env=dict(os.environ),
                           capture_output=True, text=True, timeout=3600)
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        print(f"{name}: {line[0] if line else 'FAILED'}", flush=True)
        if not line:
            sys.stderr.write(p.stderr[-2000:])


if __name__ == "__main__":
    main()
