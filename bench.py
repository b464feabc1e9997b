"""Headline benchmark: batch-LWS phase recovery throughput on one chip.

Workload = BASELINE.json config 1 scaled to a throughput batch: 32 mono 16 kHz
utterances of 5 s, 512-pt FFT, 128 hop (Q=4), L=5, sqrt-Hann default window,
100 thresholded batch-LWS iterations (alpha=100, beta=0.1, gamma=1) - the
reference's canonical configuration (matlab/run_lws.m:48-55).

Prints ONE JSON line on stdout:
  {"metric": "audio_seconds_per_second_per_chip", "value": N,
   "unit": "audio-s/s/chip", "vs_baseline": N/100}
vs_baseline is against the BASELINE.md north-star target of 100x real-time
per chip (the reference publishes no numbers of its own). Details on stderr.
"""
import json
import sys
import time

import numpy as np


def make_batch(B, n, sr_hz, rng):
    """Tone + chirp + noise mixtures (realistic harmonic spectrograms)."""
    t = np.arange(n) / sr_hz
    xs = []
    for i in range(B):
        f0 = 120 + 40 * (i % 8)
        x = (0.5 * np.sin(2 * np.pi * f0 * 2 * t)
             + 0.3 * np.sin(2 * np.pi * (f0 * 4.7) * t + 0.3 * i)
             + 0.2 * np.sin(2 * np.pi * (300 + 3000 * t / t[-1]) * t)
             + 0.05 * rng.standard_normal(n))
        xs.append(x)
    return np.stack(xs).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from lws_tpu import LWS, get_thresholds

    on_tpu = jax.default_backend() == "tpu"
    B, secs, sr_hz = (32, 5.0, 16000) if on_tpu else (2, 5.0, 16000)
    iters = 100 if on_tpu else 10

    rng = np.random.default_rng(0)
    x = make_batch(B, int(secs * sr_hz), sr_hz, rng)

    proc = LWS(512, 128)  # defaults: Pallas whole-in-VMEM kernel on TPU
    sr, si = proc.stft_ri(x)
    amp = jnp.sqrt(sr * sr + si * si)
    pair = (amp, jnp.zeros_like(amp))
    thr = jnp.asarray(get_thresholds(iters, 100, 0.1, 1), dtype=proc.rdtype)

    out = proc._batch_fn(*pair, thresholds=thr)  # compile + warm
    out[0].block_until_ready()

    n_rep = 3
    t0 = time.time()
    for _ in range(n_rep):
        out = proc._batch_fn(*pair, thresholds=thr)
    out[0].block_until_ready()
    wall = (time.time() - t0) / n_rep

    value = B * secs / wall
    cons_in = float(np.asarray(proc.get_consistency(pair)).mean())
    cons_out = float(np.asarray(proc.get_consistency(out)).mean())
    print(
        f"[bench] backend={jax.default_backend()} B={B} secs={secs} iters={iters} "
        f"T,F={tuple(amp.shape[-2:])} wall={wall * 1000:.0f}ms "
        f"consistency {cons_in:.2f} -> {cons_out:.2f} dB",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(value, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
