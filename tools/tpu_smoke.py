"""On-device TPU smoke check: the compiled Pallas kernels (tiled batch /
no-future sweeps, streaming online RTISI-LA) are verified against the
float64 C++ oracle and the reference-generated sparse online golden, on the
real chip.

Run directly (`python tools/tpu_smoke.py`) or via tests/test_tpu_smoke.py,
which subprocesses it so the CPU-forcing tests/conftest.py does not apply.
`--fuzz` additionally sweeps randomized geometries (fractional Q, Q=2..8,
wide taps, look_ahead=0) sparse-exact against the oracle on the chip —
the class of check that caught the Q=2 Mosaic empty-slice bug.

Exit codes: 0 ok, 3 no TPU available, 1 failure.

The checks use sparse-magnitude inputs (one threshold-passing bin per
frame): updates then have no in-frame order dependence, so the compiled f32
kernels must reproduce the float64 oracle's sequencing to f32 precision —
a real exactness check on hardware, not just a quality band (the dense
fp-chaos argument does not apply).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    try:
        plat = jax.devices()[0].platform.lower()
    except Exception as e:  # backend init raises UNAVAILABLE when the
        # TPU runtime/tunnel is down — an infra condition, not a failure
        print(f"NO_TPU (backend init failed: {type(e).__name__}: {e})")
        return 3
    if not ("tpu" in plat or "axon" in plat):
        print(f"NO_TPU (platform={plat})")
        return 3

    import jax.numpy as jnp
    from lws_tpu import LWS, get_thresholds
    from lws_tpu import oracle

    golden = np.load(os.path.join(os.path.dirname(__file__), os.pardir,
                                  "tests", "golden", "ref_q4.npz"))

    rng = np.random.default_rng(99)
    T, F = 48, 257
    mag = np.full((T, F), 0.5)
    for m in range(T):
        mag[m, 40 + (m * 3) % 11] = 2.0
    S_sparse = (mag * np.exp(2j * np.pi * rng.random((T, F)))).astype(np.complex128)
    S_sparse[:, 0] = mag[:, 0]
    S_sparse[:, -1] = mag[:, -1]
    thr = np.full(3, 2.0)

    failures = []

    def check(name, got, want, atol):
        err = float(np.max(np.abs(got - want)))
        status = "ok" if err <= atol else "FAIL"
        print(f"  {name}: max err {err:.2e} (atol {atol:g}) {status}")
        if err > atol:
            failures.append(name)

    p = LWS(512, 128, L=5, dtype=jnp.float32)
    print("batch (tiled kernel) vs float64 oracle, sparse exact:")
    got = np.asarray(p.batch_lws(S_sparse, thresholds=thr))
    want = oracle.oracle_sweeps(S_sparse, p.W, thr)
    check("batch", got, want, 2e-3)

    print("no-future vs float64 oracle, sparse exact:")
    got = np.asarray(p.nofuture_lws(S_sparse, thresholds=thr))
    want = oracle.oracle_sweeps(S_sparse, p.W_ai, thr, visibility=-1)
    check("nofuture", got, want, 2e-3)

    print("Q=2 small-window lowering (empty shift slices) vs oracle:")
    # Q=2 makes the carried-window shift produce EMPTY edge slices, which
    # Mosaic's concatenate rejects unless dropped (_shift_concat) — a
    # hardware-only failure interpret mode cannot see. All carries must
    # compile AND stay sparse-exact.
    from lws_tpu.ops.pallas_packed import tiled_lws_sweeps
    pq2 = LWS(512, 256, L=5, dtype=jnp.float32)
    want_q2 = oracle.oracle_sweeps(S_sparse, pq2.W, thr)
    sr2 = jnp.asarray(S_sparse.real, jnp.float32)
    si2 = jnp.asarray(S_sparse.imag, jnp.float32)
    for carry in ("stack", "rows", "direct"):
        o_r, o_i = tiled_lws_sweeps(
            sr2[None], si2[None], pq2._st_batch,
            jnp.asarray(thr, jnp.float32), pack=8, window_carry=carry,
            inner_scheme=pq2.inner_scheme)
        got = (np.asarray(o_r) + 1j * np.asarray(o_i))[0]
        check(f"q2-{carry}", got, want_q2, 2e-3)

    print("look_ahead=0 online (empty amp-window shift) compiles and runs:")
    p0 = LWS(512, 128, L=5, look_ahead=0, dtype=jnp.float32)
    got0 = np.asarray(p0.online_lws(S_sparse, thresholds=thr))
    if not np.all(np.isfinite(got0)):
        print("  la0-online: non-finite output FAIL")
        failures.append("la0-online")
    else:
        print("  la0-online: ok")

    print("segmented kernel (virtual-utterance halo exchange) on chip:")
    # the auto-segmented long-form path's kernel: block-Jacobi at the seam
    # means it is quality-equivalent to the unsegmented order, not
    # bit-equal — check magnitudes exactly and consistency within the seam
    # tolerance against the plain tiled kernel on the same dense input
    from lws_tpu.ops.pallas_packed import segmented_lws_sweeps, tiled_lws_sweeps
    S_dense = np.asarray(golden["S"]).astype(np.complex64)
    dr = jnp.asarray(np.abs(S_dense)[None], jnp.float32)
    di = jnp.zeros_like(dr)
    # alpha=1 keeps the schedule dense from sweep one, so the seam
    # behaviour is actually exercised (alpha=100's early sweeps are
    # threshold-dead no-ops)
    thr_d = jnp.asarray(get_thresholds(6, 1, 0.1, 1), jnp.float32)
    seg_r, seg_i = segmented_lws_sweeps(
        dr, di, p._st_batch, thr_d, segments=2, sweeps_per_exchange=1,
        pack=8)
    til_r, til_i = tiled_lws_sweeps(dr, di, p._st_batch, thr_d, pack=8)
    mag_err = float(np.max(np.abs(
        np.sqrt(np.asarray(seg_r)**2 + np.asarray(seg_i)**2) - np.abs(S_dense))))
    c_seg = float(np.asarray(p.get_consistency((seg_r, seg_i))).mean())
    c_til = float(np.asarray(p.get_consistency((til_r, til_i))).mean())
    ok_seg = mag_err < 2e-3 and abs(c_seg - c_til) < 0.5
    print(f"  segmented: mag err {mag_err:.2e}, consistency {c_seg:.2f} vs "
          f"tiled {c_til:.2f} dB {'ok' if ok_seg else 'FAIL'}")
    if not ok_seg:
        failures.append("segmented")

    print("MXU Jacobi fast mode (order='jacobi_mxu') on chip:")
    # banded-matmul sweeps at highest precision vs the elementwise Jacobi
    # XLA path — must agree to f32 roundoff on the sparse input
    from lws_tpu.core.batch import lws_sweeps
    sr_s = jnp.asarray(S_sparse.real[None], jnp.float32)
    si_s = jnp.asarray(S_sparse.imag[None], jnp.float32)
    mx = lws_sweeps(sr_s[0], si_s[0], p._st_batch,
                    jnp.asarray(thr, jnp.float32), order="jacobi_mxu",
                    precision="highest")
    el = lws_sweeps(sr_s[0], si_s[0], p._st_batch,
                    jnp.asarray(thr, jnp.float32), order="jacobi")
    got = np.asarray(mx[0]) + 1j * np.asarray(mx[1])
    wantj = np.asarray(el[0]) + 1j * np.asarray(el[1])
    check("jacobi_mxu", got, wantj, 2e-3)

    print("online (streaming kernel) vs reference sparse golden:")
    p2 = LWS(512, 128, L=5, look_ahead=2, dtype=jnp.float32)
    got = np.asarray(p2.online_lws(golden["online_sparse_in"],
                                   thresholds=golden["online_sparse_thr"]))
    # |temp| near-cancellation amplifies f32 rounding on sparse updates;
    # a sequencing bug would show up at O(1), not O(1e-3)
    check("online", got, golden["online_sparse_out"], 8e-3)

    print("chunked streaming (online_chunk + device OLA) vs offline, sparse:")
    from lws_tpu.streaming import StreamingLWS
    A_in = golden["online_sparse_in"]
    thr_on = golden["online_sparse_thr"]
    # fixed mean_amp = the offline threshold scale -> the stream reproduces
    # the offline online_lws commit-for-commit (see test_streaming.py)
    stream = StreamingLWS(p2, thresholds=thr_on,
                          mean_amp=float(np.abs(A_in).mean()),
                          keep_frames=True, backend="pallas")
    stream.push_frames(A_in)
    stream.flush()
    com = np.stack(stream.committed_frames)
    check("streaming", com, golden["online_sparse_out"], 8e-3)

    print("dense run_lws (music pipeline) quality parity vs reference golden:")
    pm = LWS(512, 128, L=5, mode="music", dtype=jnp.float32)
    A = np.abs(golden["S"]).astype(np.complex128)
    out = np.asarray(pm.run_lws(A))
    c = float(np.asarray(pm.get_consistency(out)))
    c_ref = float(golden["consistency_run"])
    status = "ok" if c > c_ref - 0.8 else "FAIL"
    print(f"  consistency {c:.2f} dB vs reference {c_ref:.2f} dB {status}")
    if c <= c_ref - 0.8:
        failures.append("run_lws quality")

    if "--fuzz" in sys.argv:
        print("geometry fuzz (batch sparse-exact vs oracle, on chip):")
        frng = np.random.default_rng(7)
        geoms = [(384, 96, 3, 0), (512, 256, 7, 1), (768, 128, 5, 2),
                 (640, 128, 4, 3), (500, 160, 5, 3), (512, 64, 5, 2),
                 (2048, 512, 2, 1), (384, 128, 10, 4)]
        for fsize, fshift, L, la in geoms:
            pf = LWS(fsize, fshift, L=L, look_ahead=la, dtype=jnp.float32)
            Ff = fsize // 2 + 1
            mg = np.full((48, Ff), 0.5)
            for m in range(48):
                mg[m, 10 + (m * 3) % 7] = 2.0
            Sf = (mg * np.exp(2j * np.pi * frng.random((48, Ff)))
                  ).astype(np.complex128)
            Sf[:, 0] = mg[:, 0]
            Sf[:, -1] = mg[:, -1]
            out = np.asarray(pf.batch_lws(Sf, thresholds=np.full(3, 2.0)))
            wf = oracle.oracle_sweeps(Sf, pf.W, np.full(3, 2.0))
            check(f"fuzz-{fsize}/{fshift}-L{L}-la{la}-Q{pf._Qi}", out, wf,
                  2e-3)

    if failures:
        print("SMOKE FAIL:", failures)
        return 1
    print("SMOKE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
