"""Probe: lane-granular threshold skip on the real chip (batch + vocoder +
longform geometries, default kernels), vs the unchunked path."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_batch  # noqa: E402


def run(label, fn, pair, thr, audio_s, proc):
    import numpy as np
    t0 = time.time()
    out = fn(*pair, thresholds=thr)
    out[0].block_until_ready()
    comp = time.time() - t0
    walls = []
    for _ in range(5):
        t0 = time.time()
        out = fn(*pair, thresholds=thr)
        out[0].block_until_ready()
        walls.append(time.time() - t0)
    wall = float(np.median(walls))
    c1 = float(np.asarray(proc.get_consistency(
        (out[0][:8], out[1][:8]))).mean())
    print(f"{label}: compile {comp:.1f}s wall {wall*1e3:.0f}ms "
          f"rate {audio_s/wall:.0f} audio-s/s cons {c1:.2f} dB", flush=True)
    return np.asarray(out[0]), np.asarray(out[1])


def main():
    import jax
    import jax.numpy as jnp
    import functools
    from lws_tpu import LWS, get_thresholds
    from lws_tpu.ops.pallas_packed import tiled_lws_sweeps

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    cfgs = [
        ("batch", 512, 128, 32, 5.0, 16000, 32),
        ("vocoder", 2048, 256, 16, 2.5, 22050, 256),
    ]
    for name, fsize, fshift, Bu, secs, sr_hz, B in cfgs:
        x = make_batch(Bu, int(secs * sr_hz), sr_hz, rng)
        proc = LWS(fsize, fshift)
        sr, si = proc.stft_ri(x)
        amp = jnp.sqrt(sr * sr + si * si)
        if B > Bu:
            amp = jnp.tile(amp, (B // Bu, 1, 1))
        pair = (amp, jnp.zeros_like(amp))
        thr = jnp.asarray(get_thresholds(100, 100, 0.1, 1),
                          dtype=proc.rdtype)
        pk = proc._eff_pack(pair)
        base = jax.jit(functools.partial(
            tiled_lws_sweeps, st=proc._st_batch, pack=pk))
        skip = jax.jit(functools.partial(
            tiled_lws_sweeps, st=proc._st_batch, pack=pk, lane_skip=True))
        a = run(f"{name} default   (pack {pk})", base, pair, thr,
                B * secs, proc)
        b = run(f"{name} lane_skip (pack {pk})", skip, pair, thr,
                B * secs, proc)
        d = max(abs(a[0] - b[0]).max(), abs(a[1] - b[1]).max())
        print(f"{name}: on-chip max |delta| = {d}", flush=True)


if __name__ == "__main__":
    main()
