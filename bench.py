"""Driver benchmark entry point — prints ONE JSON line.

Current flagship metric (round 1): throughput of the decoder reconstruction
core — batched bit-exact inverse DCT2 (int8-split MXU path) + prediction add
+ clip — in gigapixels/s on one chip.  Later rounds replace this with
end-to-end encode/decode frames-per-second vs the VTM single-thread anchor
(BASELINE.md); vs_baseline is 0 until that anchor metric is wired up.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vtm_tpu.ops.transform import inv_transform_batch_mxu

    B, N = 2048, 32
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.integers(-2048, 2048, size=(B, N, N)), dtype=jnp.int32)
    pred = jnp.asarray(rng.integers(0, 255, size=(B, N, N)), dtype=jnp.int32)

    @jax.jit
    def recon(c, p):
        r = inv_transform_batch_mxu(c, 8)
        return jnp.clip(p + r, 0, 255).astype(jnp.int16)

    out = recon(coeff, pred)
    out.block_until_ready()  # compile
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = recon(coeff, pred)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    gpix = B * N * N / dt / 1e9
    print(json.dumps({
        "metric": "itx32_recon_throughput",
        "value": round(gpix, 3),
        "unit": "Gpix/s",
        "vs_baseline": 0,
    }))


if __name__ == "__main__":
    main()
