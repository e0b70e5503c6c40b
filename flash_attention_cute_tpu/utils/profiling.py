"""Tracing / profiling helpers (SURVEY.md §5).

The reference's only profiling enablers are nvcc -lineinfo + NVTX linkage
for Nsight (reference: flash_attention/load_cpp_extention.py:37,
csrc/CMakeLists.txt:32-48) and CUDA-event timers in the benches. The TPU
equivalents here:

  * `trace(dir)` — context manager around jax.profiler: produces an xplane
    trace viewable in TensorBoard / Perfetto (the Nsight analog; Pallas
    kernels appear under their `name=` labels).
  * `annotate(name)` — TraceAnnotation for host-side phases.
  * `roofline(fn, *args)` — compiles fn, pulls XLA's cost analysis and the
    device's peak numbers, prints FLOP/s / bandwidth utilization — the
    per-kernel roofline the reference leaves to Nsight Compute.
"""

from __future__ import annotations

import contextlib

import jax

# Peak specs per TPU generation: (bf16 TFLOP/s, HBM GB/s) per chip.
_PEAKS = {
    4: (275.0, 1200.0),
    5: (197.0, 819.0),   # v5e; v5p is (459, 2765) — device_kind tells
    6: (918.0, 1640.0),  # v6e (Trillium)
}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fact-trace"):
    """`with trace("/tmp/t"):` — xplane trace for TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side phase annotation visible in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def device_peaks() -> tuple[float, float]:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    if "v5p" in kind or "v5 p" in kind:
        return (459.0, 2765.0)
    for gen, peaks in _PEAKS.items():
        if f"v{gen}" in kind:
            return peaks
    return _PEAKS[5]


def roofline(fn, *args, seconds: float | None = None, **kwargs) -> dict:
    """Static roofline for one jitted call.

    Returns {flops, bytes, intensity, peak_tflops, peak_gbs,
    bound, min_time_us[, achieved_tflops, mxu_util]}.
    `seconds` (measured runtime) adds achieved numbers.
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    cost = lowered.compile().cost_analysis()
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))
    peak_tflops, peak_gbs = device_peaks()

    t_compute = flops / (peak_tflops * 1e12)
    t_memory = bytes_accessed / (peak_gbs * 1e9)
    out = {
        "flops": flops,
        "bytes": bytes_accessed,
        "intensity": flops / max(bytes_accessed, 1.0),
        "peak_tflops": peak_tflops,
        "peak_gbs": peak_gbs,
        "bound": "compute" if t_compute >= t_memory else "memory",
        "min_time_us": max(t_compute, t_memory) * 1e6,
    }
    if seconds is not None:
        out["achieved_tflops"] = flops / seconds / 1e12
        out["mxu_util"] = out["achieved_tflops"] / peak_tflops
        out["achieved_gbs"] = bytes_accessed / seconds / 1e9
    return out
