"""Decode execution-device selection.

The sample plane of the decoder (batched MC, DMVR/BDOF, the fused in-loop
filter chain) runs as jax kernels that can execute on the attached
accelerator or on the host CPU backend.  Single-stream decode is a
latency-bound serial pipeline: every slice's MC batch and every picture's
filter chain must be read back before the next picture can be parsed
(intra prediction and the picture hash need host samples).  Whether the
accelerator wins therefore depends on the device->host link, not on the
kernel FLOPs.

Mirrors the reference's runtime kernel dispatch (x86/InitX86.cpp:57-120
picks SSE/AVX variants by CPUID): we probe the readback latency of the
attached device once and pick the execution placement from the
measurement.

Modes (env VTM_TPU_DECODE_DEVICE):
  auto  (default) probe the accelerator's device->host fetch latency; use
        it only if a small fetch completes in under ~3 ms (co-located
        chip).  Tunnelled/remote devices (tens of ms per fetch) lose to
        the host CPU backend on serial decode and are left to the
        throughput paths (multi-picture batch, sharded multi-chip).
  tpu   always place decode kernels on the default accelerator
  cpu   always place decode kernels on the host CPU backend
"""

from __future__ import annotations

import contextlib
import os
import time

_DECISION = None  # None = undecided; "default" | "cpu"

_FETCH_PROBE_MS_LIMIT = 3.0


def _probe_fetch_ms() -> float:
    """Warm dispatch+readback roundtrip of a tiny jitted op.

    The op is jit-compiled and executed once BEFORE timing so the probe
    measures the link sync latency, not one-time XLA compilation (a
    mistake an earlier revision made: it charged the compile of `a + 1`
    to the link and misread a ~25 ms tunnel as a ~220 ms one)."""
    import jax
    import numpy as np

    dev = jax.devices()[0]
    f = jax.jit(lambda x: x + 1)
    a = jax.device_put(np.zeros((64, 64), np.int32), dev)
    np.asarray(f(a))  # warm compile + fetch path
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(f(a))
    return (time.perf_counter() - t0) / 3 * 1e3


_PROBE_DEADLINE_S = 10.0


def _probe_fetch_ms_bounded() -> float:
    """Run the fetch probe in a daemon thread with a deadline: a wedged
    device link (tunnel hang) must degrade decode to the CPU backend, not
    block it forever."""
    import threading

    out: list[float] = []

    def run():
        try:
            out.append(_probe_fetch_ms())
        except Exception:
            pass

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(_PROBE_DEADLINE_S)
    if not out:
        return float("inf")
    return out[0]


def decode_placement() -> str:
    """'default' (leave jax's default device) or 'cpu'."""
    global _DECISION
    mode = os.environ.get("VTM_TPU_DECODE_DEVICE", "auto")
    if mode == "tpu":
        return "default"
    if mode == "cpu":
        return "cpu"
    if _DECISION is None:
        import jax

        if jax.default_backend() == "cpu":
            _DECISION = "default"
        else:
            try:
                ms = _probe_fetch_ms_bounded()
                _DECISION = "default" if ms < _FETCH_PROBE_MS_LIMIT else "cpu"
            except Exception:
                _DECISION = "default"
    return _DECISION


@contextlib.contextmanager
def decode_device_ctx():
    """Context manager placing decode-path jax ops per decode_placement()."""
    place = decode_placement()
    if place == "cpu":
        import jax

        with jax.default_device(jax.devices("cpu")[0]):
            yield
    else:
        yield
