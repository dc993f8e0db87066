"""Relay-health telemetry embedded in every timed artifact.

Committed wall times through the shared axon relay are hostage to
congestion: identical exact runs measured 78 vs 278 s and a plain-
pipeline rerun 1176 vs 54.5 s (docs/BENCHMARKS.md "Relay congestion").
A slow artifact could not previously be self-diagnosed as congestion vs
regression (VERDICT round 4, weak #5 / task 8).  This module gives every
timed artifact two health signals:

- **Compile telemetry** (``install`` + ``compile_stats``): a
  ``jax.monitoring`` duration listener accumulates the count and
  cumulative seconds of ``backend_compile`` events seen by this process.
  Through the axon relay each backend compile is a remote
  ``/remote_compile`` round trip (30-300 s under congestion), so
  ``compile_seconds`` directly measures the relay-compile share of a
  wall time.
- **Dispatch probe** (``dispatch_probe``): median host-fetch round trip
  of a trivial pre-compiled jit — the per-dispatch relay latency floor
  (~20-40 ms healthy; grows under congestion).  ``block_until_ready`` is
  async through the relay, so the probe fences with a host fetch
  (``np.asarray``), the repo's one honest fence.

The reference has no observability at all (SURVEY.md §5 "Tracing");
this subsystem is new capability, sized to the actual failure mode of
this environment.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

_STATS = {"compile_count": 0, "compile_seconds": 0.0,
          "trace_seconds": 0.0, "lowering_seconds": 0.0}
_INSTALLED = False


def install() -> None:
    """Register the compile-duration listener (idempotent).

    Call before the first jit of a timed region; events compiled before
    installation are not counted.  The listener is process-global and
    never unregistered (jax.monitoring listeners are append-only in
    practice); accumulation is monotone, so callers diff snapshots.
    """
    global _INSTALLED
    if _INSTALLED:
        return
    import jax.monitoring as monitoring

    def _on_duration(name: str, dur: float, **kw) -> None:
        if name.endswith("backend_compile_duration"):
            _STATS["compile_count"] += 1
            _STATS["compile_seconds"] += dur
        elif name.endswith("jaxpr_trace_duration"):
            _STATS["trace_seconds"] += dur
        elif name.endswith("jaxpr_to_mlir_module_duration"):
            _STATS["lowering_seconds"] += dur

    monitoring.register_event_duration_secs_listener(_on_duration)
    _INSTALLED = True


def compile_stats() -> dict:
    """Cumulative compile telemetry since ``install`` (copy)."""
    return dict(_STATS)


_PROBE = None


def _probe_fn():
    """Process-wide jitted probe: a fresh jit per call would retrace
    AND remote-compile every snapshot (30-300 s through a congested
    relay — the probe would then dominate the artifact it stamps; r5
    code-review finding).  One compile per process."""
    import jax

    global _PROBE
    if _PROBE is None:
        _PROBE = jax.jit(lambda x: x + 1.0)
    return _PROBE


def dispatch_probe(repeats: int = 5) -> dict:
    """Median/min host-fetch round trip of a trivial pre-warmed jit.

    One tiny add, compiled and warmed outside the timed window; each
    repeat times dispatch + host fetch of a (1,) f32.  On a healthy
    relay this is the ~20-40 ms dispatch floor; congestion shows up
    directly.  Runs on the default backend.
    """
    import jax.numpy as jnp

    f = _probe_fn()
    x = jnp.zeros((1,), jnp.float32)
    np.asarray(f(x))  # compile once per process + warm (honest fence)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(f(x))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {"dispatch_latency_s": times[len(times) // 2],
            "dispatch_latency_min_s": times[0],
            "dispatch_latency_max_s": times[-1],
            "dispatch_probe_repeats": repeats}


def snapshot(probe: bool = True, since: Optional[dict] = None) -> dict:
    """One dict for embedding in a timed artifact.

    ``since``: a ``compile_stats()`` taken at the start of the timed
    region — compile fields are reported as the delta, so the record
    describes *this* run, not process history.
    """
    import jax

    out = {"backend": jax.default_backend()}
    cur = compile_stats()
    base = since or {}
    for k, v in cur.items():
        out[k] = v - base.get(k, 0)
    if probe:
        out.update(dispatch_probe())
    return out
