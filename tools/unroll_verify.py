"""Verify the full-frame-unroll tiled kernel on-chip: output equality vs the
unroll=1 kernel (bit-level on the same chip) and honest per-rep timing.

tools/unroll_experiment.py reported window=rows/full-unroll at an impossible
0.000 s wall; this script times each rep individually, checks the result
against the unroll=1 output elementwise, and re-times with a fresh random
input per rep (defeating any runtime-level result caching).

Usage: python tools/unroll_verify.py [--window rows] [--reps 5]
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
    ap.add_argument("--window", default="rows")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--pack", type=int, default=16)
    ap.add_argument("--passes", type=int, default=None,
                    help="inner_passes (default: the processor's batch-stage"
                         " default, 3 at jacobi Q=4)")
    ap.add_argument("--unroll", type=int, default=-1,
                    help="frame_unroll of the probed variant (use 1 with"
                         " --window direct for the plain-direct serving"
                         " candidate)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lws_tpu import LWS, get_thresholds
    from lws_tpu.ops.pallas_packed import tiled_lws_sweeps

    B, secs, iters = 32, 5.0, 100
    rng = np.random.default_rng(0)
    x = make_batch(B, int(secs * 16000), 16000, rng)
    proc = LWS(512, 128)
    sr, si = proc.stft_ri(x)
    amp = jnp.sqrt(sr * sr + si * si)
    pair = (amp, jnp.zeros_like(amp))
    thr = jnp.asarray(get_thresholds(iters, 100, 0.1, 1), dtype=proc.rdtype)

    passes = (proc.batch_inner_passes if args.passes is None
              else int(args.passes))

    def build(u, w):
        return jax.jit(functools.partial(
            tiled_lws_sweeps, st=proc._st_batch, micro=1, pack=args.pack,
            inner_passes=passes, inner_scheme=proc.inner_scheme,
            window_carry=w, frame_unroll=u))

    base_fn = build(1, "stack")
    t0 = time.time()
    base = base_fn(*pair, thresholds=thr)
    jax.block_until_ready(base)
    print(f"unroll=1 compile {time.time() - t0:.1f}s", file=sys.stderr)

    full_fn = build(args.unroll, args.window)
    t0 = time.time()
    out = full_fn(*pair, thresholds=thr)
    jax.block_until_ready(out)
    print(f"unroll={args.unroll} ({args.window}) compile "
          f"{time.time() - t0:.1f}s", file=sys.stderr)

    dr = float(np.max(np.abs(np.asarray(out[0]) - np.asarray(base[0]))))
    di = float(np.max(np.abs(np.asarray(out[1]) - np.asarray(base[1]))))
    print(f"max |delta| vs unroll=1: real={dr:.3e} imag={di:.3e}")

    # honest timing: block on the WHOLE output, fresh input per rep
    for name, fn in (("unroll=1", base_fn), ("full", full_fn)):
        walls = []
        for r in range(args.reps):
            a = amp * (1.0 + 1e-6 * r)  # new buffer, same workload
            p = (a, jnp.zeros_like(a))
            jax.block_until_ready(p)
            t0 = time.time()
            o = fn(*p, thresholds=thr)
            jax.block_until_ready(o)
            walls.append(time.time() - t0)
        med = float(np.median(walls))
        print(f"{name:9s} walls={['%.4f' % w for w in walls]} "
              f"median={med:.4f}s  {B * secs / med:7.1f} audio-s/s")


if __name__ == "__main__":
    main()
