"""Probe: measured effect of the sparsity-threshold iteration skip on the
real chip (batch + vocoder configs, default kernels)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_batch  # noqa: E402


def run(label, proc, amp_np, iters, alpha):
    import jax.numpy as jnp
    from lws_tpu import get_thresholds
    amp = jnp.asarray(amp_np)
    pair = (amp, jnp.zeros_like(amp))
    thr = jnp.asarray(get_thresholds(iters, alpha, 0.1, 1), dtype=proc.rdtype)
    t0 = time.time()
    out = proc._batch_fn(*pair, thresholds=thr)
    out[0].block_until_ready()
    comp = time.time() - t0
    walls = []
    for _ in range(5):
        t0 = time.time()
        out = proc._batch_fn(*pair, thresholds=thr)
        out[0].block_until_ready()
        walls.append(time.time() - t0)
    wall = float(np.median(walls))
    c1 = float(np.asarray(proc.get_consistency((out[0][:8], out[1][:8]))).mean())
    print(f"{label}: compile {comp:.1f}s wall {wall*1e3:.0f}ms cons {c1:.2f} dB",
          flush=True)
    return wall


def main():
    import jax
    import jax.numpy as jnp
    from lws_tpu import LWS

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    # batch config
    x = make_batch(32, 80000, 16000, rng)
    proc = LWS(512, 128)
    sr, si = proc.stft_ri(x)
    amp = np.asarray(jnp.sqrt(sr * sr + si * si))
    w = run("batch a=100 (skip active)", proc, amp, 100, 100)
    print(f"  batch rate {32*5.0/w:.0f} audio-s/s", flush=True)
    w = run("batch a=0.01 (all live)", proc, amp, 100, 0.01)
    print(f"  batch rate {32*5.0/w:.0f} audio-s/s", flush=True)

    # vocoder config
    B, secs = 256, 2.5
    sr_hz, fsize, fshift = 22050, 2048, 256
    x = make_batch(16, int(secs * sr_hz), sr_hz, rng)
    proc = LWS(fsize, fshift)
    sr, si = proc.stft_ri(x)
    amp = np.asarray(jnp.sqrt(sr * sr + si * si))
    amp = np.tile(amp, (B // 16, 1, 1))
    w = run("vocoder a=100 (skip active)", proc, amp, 100, 100)
    print(f"  vocoder rate {B*secs/w:.0f} audio-s/s", flush=True)


if __name__ == "__main__":
    main()
