"""Round-5 serving-kernel timing probe (bench mixtures, subprocess-fresh).

Runs the batch bench workload (32x5s, 512/128, 100 sweeps, ip1) in a fresh
subprocess per case. Cases: `direct` (direct-p32) and `rows-unroll` (the
serving mode; ~3 min compile unless the XLA cache is warm).

History: this harness measured the round-5 arithmetic experiments on the
tap loop and phase epilogue (PERF.md round-5 levers). Outcomes — FMA-chained
tap accumulation: −2% (serializes the accumulate chain); split accumulators
(2/4/8-way): ±0% (Mosaic's scheduling already covers the chain); rsqrt
phase epilogue: +7% on the serving mode at identical consistency → ADOPTED
as the production formula (core/stencil.phase_update + every kernel), so
the switches were removed and all cases now run the adopted arithmetic.
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
kw = dict(inner_passes=1, pallas_window="direct", pallas_pack=32)
if "%MODE%" == "rows-unroll":
    kw = dict(inner_passes=1, pallas_unroll=-1, pallas_window="rows")
rng = np.random.default_rng(0)
t = np.arange(80000) / 16000.0
xs = []
for i in range(32):
    f0 = 120 + 40 * (i % 8)
    xs.append(0.5*np.sin(2*np.pi*f0*2*t) + 0.3*np.sin(2*np.pi*(f0*4.7)*t + 0.3*i)
              + 0.2*np.sin(2*np.pi*(300+3000*t/t[-1])*t) + 0.05*rng.standard_normal(t.size))
x = np.stack(xs).astype(np.float32)
proc = LWS(512, 128, **kw)
sr, si = proc.stft_ri(x)
amp = jnp.sqrt(sr*sr + si*si)
pair = (amp, jnp.zeros_like(amp))
thr = jnp.asarray(get_thresholds(100, 100, 0.1, 1), dtype=proc.rdtype)
probe = jax.jit(lambda o: o.ravel()[-1].astype(jnp.float32))
out = proc._batch_fn(*pair, thresholds=thr)
float(probe(out[0]))
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
print(f"RESULT wall={w*1e3:.0f}ms rate={160.0/w:.0f} cons={c:.3f}")
'''


def main():
    args = sys.argv[1:] or ["direct", "rows-unroll"]
    for mode in args:
        if mode not in ("direct", "rows-unroll"):
            sys.exit(f"unknown case {mode!r}; available: direct, rows-unroll")
        code = INNER.replace("%MODE%", mode)
        p = subprocess.run([sys.executable, "-c", code], env=dict(os.environ),
                           capture_output=True, text=True, timeout=3600)
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        print(f"{mode}: {line[0] if line else 'FAILED'}", flush=True)
        if not line:
            sys.stderr.write(p.stderr[-2000:])


if __name__ == "__main__":
    main()
