"""Multi-host execution: distributed init, topology-aware meshes, and a
scaling-efficiency harness.

The reference is single-threaded C; this layer is new in the TPU build
(SURVEY.md 2.6). Topology model:

  - Within a host/slice, chips are connected by ICI (fast, ~100s of GB/s).
    Across hosts, traffic rides DCN (slower, ~10s of GB/s).
  - LWS's only cross-device traffic is (a) nothing at all for data-parallel
    utterance batches and (b) the (Q-1)-frame halo exchange + one scalar
    psum per round for time-sharded sweeps. Halos are tiny — Q-1 frames of
    F bins, e.g. 3*2049*4 B ≈ 24 KB per boundary for the 4096-pt long-form
    config — so even DCN boundaries cost microseconds against ~10s of ms of
    sweep compute per round; `sweeps_per_exchange` stretches that further.
  - `make_host_mesh` therefore lays the 'time' axis out contiguously within
    each host (halo neighbours ride ICI; only the one boundary pair between
    consecutive hosts crosses DCN) and 'data' across hosts (no traffic).

Launch recipe (one process per host, standard JAX multi-process):

    # on every host
    import lws_tpu.parallel as par
    par.init_distributed()            # env-driven (TPU pods autoconfigure)
    mesh = par.make_host_mesh(data=1, time=jax.device_count())
    ... par.sharded_lws_sweeps(..., mesh=mesh, kernel="tiled")

`init_distributed` wraps jax.distributed.initialize; on Cloud TPU pods the
coordinator/process count are auto-detected, elsewhere pass them (or set
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
"""
from __future__ import annotations

import os

import numpy as np

import jax

from .sharding import make_mesh, sharded_lws_sweeps, shard_pair

__all__ = ["init_distributed", "make_host_mesh", "scaling_report"]


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialise JAX multi-process execution (idempotent).

    Returns True if distributed mode is active after the call. Single-process
    runs (num_processes == 1 or nothing configured) are a no-op.

    Must be the first JAX call in the process: jax.distributed.initialize
    refuses to run once the XLA backend exists, so the idempotency check
    here deliberately avoids any device/backend query (jax.process_count()
    itself would initialise the backend and make initialisation impossible).
    A too-late call raises instead of silently degrading to N independent
    single-process jobs.
    """
    if jax.distributed.is_initialized():
        return jax.process_count() > 1  # already initialised
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # Cloud TPU pods: jax.distributed.initialize() autodetects;
        # calling it unconfigured off-pod raises, so only try when it
        # looks like one. A single-entry TPU_WORKER_HOSTNAMES (no comma)
        # is a 1-host slice — single-process, nothing to initialise.
        if ("," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")):
            jax.distributed.initialize()
            return jax.process_count() > 1
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


def make_host_mesh(data: int = 1, time: int = 1, devices=None):
    """('data', 'time') mesh with the time axis contiguous within hosts.

    jax.devices() orders devices by process; reshaping host-major therefore
    keeps time-neighbours (the halo-exchange partners) on the same host's
    ICI wherever possible, with exactly one DCN boundary between consecutive
    hosts. 'data' spans hosts freely (data-parallel needs no communication).
    """
    if devices is None:
        devices = jax.devices()
    n = data * time
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    devices = sorted(devices[:n], key=lambda d: (d.process_index, d.id))
    # host-major order; Fortran reshape puts consecutive devices along the
    # *time* axis (axis 1 varies fastest in C order -> use C order with
    # (data, time) so time is the fast axis)
    dev = np.asarray(devices).reshape(data, time)
    from jax.sharding import Mesh
    return Mesh(dev, ("data", "time"))


def scaling_report(proc, T_frames: int = 2048, iters: int = 20,
                   time_shards: int | None = None, kernel: str = "xla",
                   interpret: bool | None = None, n_rep: int = 3):
    """Measure time-sharded scaling efficiency on the available devices.

    Runs `iters` sweeps of a (T_frames, F) random-magnitude spectrogram
    unsharded on one device and time-sharded over `time_shards` devices,
    and reports wall times + efficiency = t_1 / (t_N * N). On a virtual CPU
    mesh this is a *dry-run estimate* (CPU cores share memory bandwidth);
    on a real slice it is the BASELINE.md multi-host scaling measurement.

    Returns a dict (also printable as one JSON-ish line).
    """
    import time as _time

    import jax.numpy as jnp

    from ..core.stencil import split
    from ..windows import get_thresholds

    devices = jax.devices()
    n = time_shards or len(devices)
    if interpret is None:
        interpret = devices[0].platform != "tpu"
    F = proc.fftsize // 2 + 1
    T = (T_frames // n) * n
    rng = np.random.default_rng(0)
    A = np.abs(rng.standard_normal((T, F))).astype(np.float64)
    pair = split(A + 0j, dtype=proc.rdtype)
    thr = jnp.asarray(get_thresholds(iters, 100, 0.1, 1), dtype=proc.rdtype)

    def run(mesh, p):
        out = sharded_lws_sweeps(*p, st=proc._st_batch, thresholds=thr,
                                 mesh=mesh, kernel=kernel, interpret=interpret)
        out[0].block_until_ready()
        return out

    def best_wall(mesh, p):
        run(mesh, p)  # compile + warm
        walls = []
        for _ in range(n_rep):
            t0 = _time.time()
            run(mesh, p)
            walls.append(_time.time() - t0)
        return float(np.median(walls))

    mesh1 = make_mesh(data=1, time=1, devices=devices[:1])
    meshN = make_host_mesh(data=1, time=n, devices=devices)
    p1 = shard_pair(pair, mesh1, time_sharded=True)
    pN = shard_pair(pair, meshN, time_sharded=True)
    t1 = best_wall(mesh1, p1)
    tN = best_wall(meshN, pN)
    eff = t1 / (tN * n) if tN > 0 else float("nan")
    return {
        "T": T, "F": F, "iters": iters, "shards": n, "kernel": kernel,
        "platform": devices[0].platform,
        "wall_1dev_s": round(t1, 4), "wall_Ndev_s": round(tN, 4),
        "speedup": round(t1 / tN, 3) if tN else None,
        "efficiency": round(eff, 3),
        "estimate_only": devices[0].platform != "tpu",
    }
