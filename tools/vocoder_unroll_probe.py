"""Probe: does the full frame unroll (pallas_unroll=-1) pay on the vocoder
geometry (F=1025, Q=8, L=5, pack=8) like it does on the bench headline
config (+34%, PERF.md)?  Run on the real chip; prints steady-state walls."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_batch  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from lws_tpu import LWS, get_thresholds

    assert jax.default_backend() == "tpu", jax.default_backend()
    B, secs, iters = 128, 2.5, 100
    sr_hz, fsize, fshift = 22050, 2048, 256
    rng = np.random.default_rng(3)
    x = make_batch(16, int(secs * sr_hz), sr_hz, rng)

    for label, kw in [("default", {}),
                      ("unroll_rows", dict(pallas_unroll=-1,
                                           pallas_window="rows"))]:
        proc = LWS(fsize, fshift, **kw)
        sr, si = proc.stft_ri(x)
        amp = jnp.sqrt(sr * sr + si * si)
        amp = jnp.tile(amp, (B // amp.shape[0], 1, 1))
        pair = (amp, jnp.zeros_like(amp))
        thr = jnp.asarray(get_thresholds(iters, 100, 0.1, 1),
                          dtype=proc.rdtype)
        t0 = time.time()
        out = proc._batch_fn(*pair, thresholds=thr)
        out[0].block_until_ready()
        compile_wall = time.time() - t0
        walls = []
        for _ in range(3):
            t0 = time.time()
            out = proc._batch_fn(*pair, thresholds=thr)
            out[0].block_until_ready()
            walls.append(time.time() - t0)
        wall = float(np.median(walls))
        rate = B * secs / wall
        c1 = float(np.asarray(proc.get_consistency(
            (out[0][:16], out[1][:16]))).mean())
        print(f"{label}: compile {compile_wall:.1f}s wall {wall*1e3:.0f}ms "
              f"rate {rate:.0f} audio-s/s cons {c1:.2f} dB", flush=True)


if __name__ == "__main__":
    main()
