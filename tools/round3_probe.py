"""Round-3 perf probe: serving-mode (full frame unroll) on the vocoder and
longform bench configs, vs the committed defaults.

Run on the real chip:  python tools/round3_probe.py [vocoder|longform|both]
"""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "lws_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2.0")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_batch  # noqa: E402


def timed(fn, *args, n_rep=3, **kw):
    import jax
    t0 = time.time()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    compile_wall = time.time() - t0
    walls = []
    for _ in range(n_rep):
        t0 = time.time()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        walls.append(time.time() - t0)
    return out, float(np.median(walls)), compile_wall


def probe_batch(variants):
    import jax.numpy as jnp
    from lws_tpu import LWS, get_thresholds
    B, secs, iters = 32, 5.0, 100
    rng = np.random.default_rng(0)
    x = make_batch(B, int(secs * 16000), 16000, rng)
    base = LWS(512, 128)
    sr, si = base.stft_ri(x)
    amp = jnp.sqrt(sr * sr + si * si)
    amp = jnp.asarray(np.asarray(amp))
    zeros = jnp.zeros_like(amp)
    thr = jnp.asarray(get_thresholds(iters, 100, 0.1, 1), dtype=base.rdtype)
    for name, kw in variants:
        try:
            proc = LWS(512, 128, **kw)
            out, wall, cw = timed(proc._batch_fn, amp, zeros, thresholds=thr)
            c1 = float(np.asarray(proc.get_consistency(out)).mean())
            print(f"[batch/{name}] wall={wall*1000:.0f}ms "
                  f"rate={B*secs/wall:.0f} audio-s/s cons={c1:.2f} dB "
                  f"(first-call {cw:.0f}s)", flush=True)
        except Exception as e:
            print(f"[batch/{name}] FAILED: {str(e)[:300]}", flush=True)


def probe_vocoder(variants):
    import jax.numpy as jnp
    from lws_tpu import LWS, get_thresholds
    from lws_tpu.mel import mel_filterbank, linear_to_mel, mel_to_linear
    B, secs, iters = 1024, 2.5, 100
    sr_hz, fsize, fshift = 22050, 2048, 256
    rng = np.random.default_rng(3)
    uniq = make_batch(16, int(secs * sr_hz), sr_hz, rng)
    base = LWS(fsize, fshift)
    sr, si = base.stft_ri(uniq)
    mag = jnp.sqrt(sr * sr + si * si)
    fb = mel_filterbank(80, fsize, sr_hz)
    mel = linear_to_mel(mag, fb)
    mel = jnp.tile(mel, (B // mel.shape[0], 1, 1))
    lin = mel_to_linear(mel, fb).astype(base.rdtype)
    lin = jnp.asarray(np.asarray(lin))  # materialize once
    zeros = jnp.zeros_like(lin)
    thr = jnp.asarray(get_thresholds(iters, 100, 0.1, 1), dtype=base.rdtype)
    audio_s = B * secs
    for name, kw in variants:
        try:
            proc = LWS(fsize, fshift, **kw)
            out, wall, cw = timed(proc._batch_fn, lin, zeros, thresholds=thr,
                                  n_rep=2)
            c1 = float(np.asarray(
                proc.get_consistency((out[0][:16], out[1][:16]))).mean())
            print(f"[vocoder/{name}] wall={wall*1000:.0f}ms "
                  f"rate={audio_s/wall:.0f} audio-s/s cons={c1:.2f} dB "
                  f"(first-call {cw:.0f}s)", flush=True)
        except Exception as e:
            print(f"[vocoder/{name}] FAILED: {str(e)[:300]}", flush=True)


def probe_longform(variants):
    import jax.numpy as jnp
    from lws_tpu import LWS, get_thresholds
    secs, iters = 630.0, 100
    sr_hz, fsize, fshift = 48000, 4096, 1024
    rng = np.random.default_rng(4)
    x = make_batch(1, int(secs * sr_hz), sr_hz, rng)
    base = LWS(fsize, fshift)
    sr, si = base.stft_ri(x)
    amp = jnp.sqrt(sr * sr + si * si)
    amp = jnp.asarray(np.asarray(amp))
    zeros = jnp.zeros_like(amp)
    thr = jnp.asarray(get_thresholds(iters, 100, 0.1, 1), dtype=base.rdtype)
    for name, kw in variants:
        try:
            proc = LWS(fsize, fshift, **kw)
            out, wall, cw = timed(proc._batch_fn, amp, zeros, thresholds=thr,
                                  n_rep=2)
            c1 = float(np.asarray(proc.get_consistency(out)).mean())
            print(f"[longform/{name}] wall={wall*1000:.0f}ms "
                  f"rate={secs/wall:.0f} audio-s/s cons={c1:.2f} dB "
                  f"(first-call {cw:.0f}s)", flush=True)
        except Exception as e:
            print(f"[longform/{name}] FAILED: {str(e)[:300]}", flush=True)


VARIANTS = {
    "default": {},
    "unroll-rows": dict(pallas_unroll=-1, pallas_window="rows"),
    "p16c2": dict(pallas_tap_chunks=2),          # pack stays 16: chunks fit it
    "p16c3": dict(pallas_tap_chunks=3),
    "p16c2-unroll": dict(pallas_tap_chunks=2, pallas_unroll=-1,
                         pallas_window="rows"),
    "c2-unroll-p8": dict(pallas_tap_chunks=2, pallas_unroll=-1,
                         pallas_window="rows", pallas_pack=8),
    "passes2": dict(inner_passes=2),
    "direct": dict(pallas_window="direct"),
    "direct-p8": dict(pallas_window="direct", pallas_pack=8),
    "direct-p32": dict(pallas_window="direct", pallas_pack=32),
    "direct-passes2": dict(pallas_window="direct", inner_passes=2),
    "direct-unroll": dict(pallas_window="direct", pallas_unroll=-1),
    "direct-unroll-p8": dict(pallas_window="direct", pallas_unroll=-1,
                             pallas_pack=8),
    "bf16-p16": dict(pallas_storage="bfloat16"),
    "direct-bf16": dict(pallas_window="direct", pallas_storage="bfloat16"),
}

if __name__ == "__main__":
    which = sys.argv[1]
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else ["default"]
    variants = [(n, VARIANTS[n]) for n in names]
    if which in ("batch", "both"):
        probe_batch(variants)
    if which in ("vocoder", "both"):
        probe_vocoder(variants)
    if which in ("longform", "both"):
        probe_longform(variants)
