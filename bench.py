"""Driver benchmark entry point — prints ONE JSON line.

END-TO-END metric: full decode throughput (CABAC parse + MV derivation on
host, batched MC/DMVR/BDOF + whole-plane deblock/SAO/ALF on the TPU,
decoded-picture-hash verified) of the reference RA bitstream
ra_full_bq416_qp37 (8 frames, 416x240, full VVC inter toolset).

vs_baseline compares against the reference DecoderApp single-thread decode
of the same stream measured on this host: 0.062 s for 8 frames ≈ 129 fps
(BASELINE.md; DecApp timing `source/App/DecoderApp/DecApp.cpp:76`).
"""

import io
import json
import time

VTM_DECODE_FPS = 129.0  # reference DecoderApp, same stream, this host


def _decode_once():
    from vtm_tpu.decoder.declib import Decoder

    with open("testdata/ra_full_bq416_qp37.bit", "rb") as f:
        data = f.read()
    dec = Decoder()
    pics = dec.decode_stream(data)
    mismatches = sum(1 for hr in dec.hash_results if not hr.ok)
    assert len(dec.hash_results) == len(pics)
    return len(pics), mismatches


def main():
    # warm-up: first pass compiles every kernel shape
    n, bad = _decode_once()
    assert bad == 0, f"hash mismatches: {bad}"
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        n, bad = _decode_once()
        assert bad == 0
    dt = (time.perf_counter() - t0) / iters
    fps = n / dt
    print(json.dumps({
        "metric": "e2e_decode_fps_ra_full_bq416_qp37",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / VTM_DECODE_FPS, 4),
    }))


if __name__ == "__main__":
    main()
