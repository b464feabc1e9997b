"""Pallas TPU kernels for the LWS sweeps (the kernels the processor runs).

- `tiled_lws_sweeps` — batch/no-future sweeps for arbitrary T (state streamed
  through VMEM time tiles); the production batch kernel.
- `segmented_lws_sweeps` — tiled sweeps with the time axis split into
  sublane-packed virtual utterances (long single-stream recovery).
- `packed_lws_sweeps` — fully-VMEM-resident variant (small T*F).
- `packed_rtisi_la` / `online_chunk` / `online_chunk_init` — streaming online
  (TF-RTISI-LA) kernels, offline and chunked-serving forms.
- `*_supported` — VMEM-fit gates for the corresponding kernels.
"""
from .pallas_packed import (
    MAX_Q,
    online_chunk,
    online_chunk_init,
    online_supported,
    packed_lws_sweeps,
    packed_rtisi_la,
    packed_supported,
    segmented_lws_sweeps,
    effective_fold,
    tiled_lws_sweeps,
    tiled_supported,
)

__all__ = [
    "MAX_Q",
    "online_chunk",
    "online_chunk_init",
    "online_supported",
    "packed_lws_sweeps",
    "packed_rtisi_la",
    "packed_supported",
    "segmented_lws_sweeps",
    "effective_fold",
    "tiled_lws_sweeps",
    "tiled_supported",
]
