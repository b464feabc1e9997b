"""Lane-fold A/B on the vocoder bench config (bf16, F=1025, B=1024) via
bench.py's own bench_vocoder, with LWS monkeypatched to pin pallas_fold.
Fresh subprocess per case; run the list twice for a same-block comparison.
"""
import os
import subprocess
import sys

INNER = r'''
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "lws_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2.0")
import warnings
warnings.simplefilter("ignore")
import lws_tpu, bench
_orig = lws_tpu.LWS
def _patched(*a, **k):
    k["pallas_fold"] = %FOLD%
    return _orig(*a, **k)
lws_tpu.LWS = _patched
r = bench.bench_vocoder(True)
rate = r["audio_s"] / r["wall"]
print(f"RESULT wall={r['wall']:.3f}s rate={rate:.0f} cons={r['cons'][1]:.3f}")
'''

CASES = {"voc-f1": "1", "voc-auto": '"auto"'}


def main():
    names = sys.argv[1:] or ["voc-f1", "voc-auto"]
    unknown = [n for n in names if n not in CASES]
    if unknown:
        sys.exit(f"unknown case(s) {unknown}; available: {sorted(CASES)}")
    for name in names:
        code = INNER.replace("%FOLD%", CASES[name])
        p = subprocess.run([sys.executable, "-c", code], env=dict(os.environ),
                           capture_output=True, text=True, timeout=3600)
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        print(f"{name}: {line[0] if line else 'FAILED'}", flush=True)
        if not line:
            sys.stderr.write(p.stderr[-2500:])


if __name__ == "__main__":
    main()
