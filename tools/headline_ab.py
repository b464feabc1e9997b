"""A/B the batch-headline serving modes with the exact bench.py harness.

Answers one question: which inner_passes=1 kernel mode should config 1
report — auto (direct-p32), explicit direct-p32, or the round-3 serving
mode (rows + full unroll)? Uses bench.make_batch/_timed so numbers are
directly comparable with BENCHMARKS.md rows.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from bench import make_batch, _timed  # noqa: E402


def main():
    import jax.numpy as jnp
    from lws_tpu import LWS, get_thresholds

    B, secs, iters = 32, 5.0, 100
    rng = np.random.default_rng(0)
    x = make_batch(B, int(secs * 16000), 16000, rng)

    cases = {
        "auto-ip1": dict(inner_passes=1),
        "direct-p32-ip1": dict(inner_passes=1, pallas_window="direct",
                               pallas_pack=32),
        "direct-p16-ip1": dict(inner_passes=1, pallas_window="direct",
                               pallas_pack=16),
        "rows-unroll-ip1": dict(inner_passes=1, pallas_unroll=-1,
                                pallas_window="rows"),
        "stack-p16-ip1": dict(inner_passes=1, pallas_window="stack",
                              pallas_pack=16),
    }
    names = sys.argv[1:] or list(cases)
    unknown = [n for n in names if n not in cases]
    if unknown:
        sys.exit(f"unknown case(s) {unknown}; available: {sorted(cases)}")
    for name in names:
        kw = cases[name]
        proc = LWS(512, 128, **kw)
        sr, si = proc.stft_ri(x)
        amp = jnp.sqrt(sr * sr + si * si)
        pair = (amp, jnp.zeros_like(amp))
        plan = proc._plan_tiled(pair)
        thr = jnp.asarray(get_thresholds(iters, 100, 0.1, 1),
                          dtype=proc.rdtype)
        out, wall = _timed(proc._batch_fn, *pair, thresholds=thr)
        c1 = float(np.asarray(proc.get_consistency(out)).mean())
        print(f"[ab] {name}: plan={plan} wall={wall * 1e3:.0f}ms "
              f"rate={B * secs / wall:.0f} audio-s/s cons={c1:.2f} dB",
              flush=True)


if __name__ == "__main__":
    main()
