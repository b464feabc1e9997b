from .pallas_stencil import pallas_lws_sweeps, pallas_supported

__all__ = ["pallas_lws_sweeps", "pallas_supported"]
