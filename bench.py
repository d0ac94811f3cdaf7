"""Driver benchmark entry point — prints ONE JSON line.

Flagship metric: throughput of the TPU decode-reconstruction core — batched
subblock motion compensation (per-phase FIR matrices on the MXU, bit-exact
vs the scalar reference path, see vtm_tpu/ops/mc_tpu.py) fused with the
residual add + clip — in gigapixels/s on one chip.

vs_baseline compares against the reference DecoderApp's single-thread decode
pixel rate measured on this host (RA bitstream ra_full_bq416_qp37: 8 frames
of 416x240 in 0.057 s ≈ 0.0140 Gpix/s; `DecoderApp -b ... Total Time`).
That anchors the sample-reconstruction compute path against the only
operational baseline the reference publishes (BASELINE.md).
"""

import json
import time

import numpy as np

VTM_DECODE_GPIX_S = 0.0140  # measured on this host, see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from vtm_tpu.ops import mc_tpu as MT

    rng = np.random.default_rng(0)
    # one 1080p frame worth of 4x4 luma MC jobs
    N = (1920 // 4) * (1088 // 4)
    win = jnp.asarray(
        rng.integers(0, 1023, size=(N, 11, 11)), dtype=jnp.int32
    )
    sel_h = jnp.asarray(rng.integers(0, 16, size=N), dtype=jnp.int32)
    sel_v = jnp.asarray(rng.integers(0, 16, size=N), dtype=jnp.int32)
    mode = jnp.asarray(rng.integers(0, 4, size=N), dtype=jnp.int32)
    resi = jnp.asarray(rng.integers(-512, 512, size=(N, 4, 4)), dtype=jnp.int32)

    mc = MT.make_mc_kernel(bd=10, luma=True, uni=True)

    @jax.jit
    def recon(w, sh, sv, m, r):
        pred = mc(w, sh, sv, m)
        return jnp.clip(pred + r, 0, 1023).astype(jnp.int16)

    out = recon(win, sel_h, sel_v, mode, resi)
    out.block_until_ready()  # compile
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = recon(win, sel_h, sel_v, mode, resi)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    gpix = N * 16 / dt / 1e9
    print(json.dumps({
        "metric": "mc_recon_core_throughput",
        "value": round(gpix, 3),
        "unit": "Gpix/s",
        "vs_baseline": round(gpix / VTM_DECODE_GPIX_S, 1),
    }))


if __name__ == "__main__":
    main()
