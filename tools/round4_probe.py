"""Round-4 perf probe: kernel-level tiled_lws_sweeps variants on the
bench geometries, with explicit tile/pack/window_carry control (the
processor's auto-planner only exposes the supported combinations; this
harness probes the raw kernel to calibrate the planner).

Run on the real chip:  python tools/round4_probe.py <config> <variant,...>
configs: vocoder (B=1024,T=216,F=1025,Q=8), batch (B=32,T=628,F=257,Q=4),
         longform (segmented auto path via processor)
"""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "lws_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2.0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from lws_tpu import LWS, get_thresholds
    from lws_tpu.ops.pallas_packed import tiled_lws_sweeps

    which = sys.argv[1]
    names = sys.argv[2].split(",")

    if which == "vocoder":
        fsize, fshift, B, T, F, iters, audio_s = 2048, 256, 1024, 216, 1025, 100, 1024 * 2.5
    elif which == "batch":
        fsize, fshift, B, T, F, iters, audio_s = 512, 128, 32, 628, 257, 100, 32 * 5.0
    elif which == "q2":
        # low-overlap geometry (Q=2, color2x3 default scheme): decides
        # whether the auto window planner should prefer direct at small Q
        fsize, fshift, B, T, F, iters, audio_s = 512, 256, 32, 314, 257, 100, 32 * 5.0
    else:
        raise SystemExit(f"unknown config {which}")

    proc = LWS(fsize, fshift)
    rng = np.random.default_rng(0)
    # harmonic-ish magnitudes (consistency only used as a sanity cross-check)
    sr = jnp.asarray(np.abs(rng.standard_normal((B, T, F))) + 0.1, jnp.float32)
    si = jnp.zeros_like(sr)
    thr = jnp.asarray(get_thresholds(iters, 100, 0.1, 1), jnp.float32)

    VARIANTS = {
        "default": dict(),                      # planner default (stack)
        "stack-p8": dict(pack=8),
        "stack-p8-unroll": dict(pack=8, frame_unroll=-1, window_carry="rows"),
        "c2-p16": dict(pack=16, tap_chunks=2),
        "direct-p16-t16": dict(pack=16, window_carry="direct", tile=16),
        "direct-p8-t48": dict(pack=8, window_carry="direct", tile=48),
        "direct-p8-t80": dict(pack=8, window_carry="direct", tile=80),
        "direct-p8": dict(pack=8, window_carry="direct"),
        "direct-p16": dict(pack=16, window_carry="direct"),
        "direct-p32": dict(pack=32, window_carry="direct"),
        "direct-p16-unroll": dict(pack=16, window_carry="direct",
                                  frame_unroll=-1),
        "direct-p8-unroll": dict(pack=8, window_carry="direct",
                                 frame_unroll=-1),
        "rows-p16": dict(pack=16, window_carry="rows"),
        "direct-p64": dict(pack=64, window_carry="direct"),
        # headline decision at the quality default (batch_inner_passes=3
        # for jacobi Q=4): serving unroll vs plain direct
        "unroll-p16-ip3": dict(pack=16, frame_unroll=-1, window_carry="rows",
                               inner_passes=3),
        "direct-p32-ip3": dict(pack=32, window_carry="direct",
                               inner_passes=3),
        "stack-p16-ip3": dict(pack=16, inner_passes=3),
        "unroll-p16": dict(pack=16, frame_unroll=-1, window_carry="rows"),
        "direct-unroll-p16": dict(pack=16, frame_unroll=-1,
                                  window_carry="direct"),
    }

    for name in names:
        kw = dict(VARIANTS[name])
        if "pack" not in kw:
            kw["pack"] = proc._eff_pack((sr, si)) or 8
        # run the processor's default in-frame scheme for the geometry
        # (color2x3 at Q <= 3), so carry-mode comparisons reflect what the
        # production path would launch
        kw.setdefault("inner_scheme", proc.inner_scheme)
        fn = jax.jit(lambda a, b, t, kw=kw: tiled_lws_sweeps(
            a, b, proc._st_batch, t, **kw))
        try:
            t0 = time.time()
            out = fn(sr, si, thr)
            jax.block_until_ready(out)
            cw = time.time() - t0
            walls = []
            for _ in range(3):
                t0 = time.time()
                out = fn(sr, si, thr)
                jax.block_until_ready(out)
                walls.append(time.time() - t0)
            wall = float(np.median(walls))
            chk = float(np.asarray(out[0]).std())
            print(f"[{which}/{name}] wall={wall*1000:.0f}ms "
                  f"rate={audio_s/wall:.0f} audio-s/s std={chk:.4f} "
                  f"(first-call {cw:.0f}s)", flush=True)
        except Exception as e:
            import re
            m = re.search(r"Scoped allocation with size ([0-9.]+)M", str(e))
            msg = f"OOM demand={m.group(1)}M" if m else str(e)[:200]
            print(f"[{which}/{name}] FAILED: {msg}", flush=True)


if __name__ == "__main__":
    main()
