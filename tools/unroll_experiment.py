"""Measure frame_unroll on the bench-config tiled kernel (real TPU).

PERF.md's roofline note predicts the per-frame register-window shift
(a (2Q-1, P, Fpad) concat rebuilt every frame) could become register
renaming if Mosaic unrolls the frame loop: with unroll=k, k consecutive
frame bodies are inlined so the shifted window of body i+1 is body i's
values under new names, no data movement.  This script measures it:
tiled_lws_sweeps with frame_unroll in {1, 2, 4, 2Q-1} on the BASELINE
config-1 workload (32x5 s 16 kHz, 512/128, Q=4, L=5, 100 sweeps, pack=16).

Usage: python tools/unroll_experiment.py [--unrolls 1,2,4,7] [--reps 3]
Prints one line per setting: unroll, median wall, audio-s/s, consistency.
"""
import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_batch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unrolls", default="1,2,4,7")
    ap.add_argument("--windows", default="stack,rows",
                    help="window_carry modes to sweep")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pack", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lws_tpu import LWS, get_thresholds
    from lws_tpu.ops.pallas_packed import tiled_lws_sweeps

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    B, secs, iters = 32, 5.0, 100
    rng = np.random.default_rng(0)
    x = make_batch(B, int(secs * 16000), 16000, rng)
    proc = LWS(512, 128)
    sr, si = proc.stft_ri(x)
    amp = jnp.sqrt(sr * sr + si * si)
    pair = (amp, jnp.zeros_like(amp))
    thr = jnp.asarray(get_thresholds(iters, 100, 0.1, 1), dtype=proc.rdtype)
    c0 = float(np.asarray(proc.get_consistency(pair)).mean())
    print(f"start consistency {c0:.2f} dB", file=sys.stderr)

    results = []
    for w in args.windows.split(","):
        for u in [int(s) for s in args.unrolls.split(",")]:
            fn = jax.jit(functools.partial(
                tiled_lws_sweeps, st=proc._st_batch, micro=1, pack=args.pack,
                inner_passes=proc.inner_passes,
                inner_scheme=proc.inner_scheme,
                window_carry=w, frame_unroll=u))
            t0 = time.time()
            try:
                out = fn(*pair, thresholds=thr)
                out[0].block_until_ready()
            except Exception as e:  # noqa: BLE001 - record compile failures
                print(f"window={w:5s} unroll={u:2d}  FAILED: "
                      f"{str(e).splitlines()[0][:120]}")
                continue
            compile_s = time.time() - t0
            walls = []
            for _ in range(args.reps):
                t0 = time.time()
                out = fn(*pair, thresholds=thr)
                out[0].block_until_ready()
                walls.append(time.time() - t0)
            wall = float(np.median(walls))
            c1 = float(np.asarray(proc.get_consistency(out)).mean())
            thru = B * secs / wall
            results.append((w, u, wall, thru, c1))
            print(f"window={w:5s} unroll={u:2d}  wall={wall:.3f}s  "
                  f"{thru:7.1f} audio-s/s  consistency={c1:.2f} dB  "
                  f"(compile {compile_s:.1f}s)")
    if not results:
        sys.exit("no setting compiled")
    best = max(results, key=lambda r: r[3])
    base = next((r for r in results if r[:2] == ("stack", 1)), None)
    rel = f" ({best[3] / base[3] - 1:+.1%} vs stack/1)" if base else ""
    print(f"best: window={best[0]} unroll={best[1]} at {best[3]:.1f} "
          f"audio-s/s{rel}")
    print("NOTE: timings reuse one input buffer; full-unroll kernels must be "
          "confirmed with tools/unroll_verify.py (fresh buffers per rep)")


if __name__ == "__main__":
    main()
