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


VTM_ENCODE_AI_FPS = 1 / 3.046  # reference EncoderApp AI small208 qp32, this host


def _encode_once() -> float:
    """AI encode of one small208 frame; returns seconds."""
    from vtm_tpu.common.exec_mode import decode_device_ctx
    from vtm_tpu.encoder.enc_lib import EncoderConfig, IntraEncoder

    with open("testdata/small208_208x120_420_8.yuv", "rb") as f:
        raw = f.read(208 * 120 * 3 // 2)
    import numpy as np

    y = np.frombuffer(raw[: 208 * 120], np.uint8).reshape(120, 208)
    u = np.frombuffer(raw[208 * 120 : 208 * 120 * 5 // 4], np.uint8).reshape(60, 104)
    v = np.frombuffer(raw[208 * 120 * 5 // 4 :], np.uint8).reshape(60, 104)
    frame = [y.astype(np.int32), u.astype(np.int32), v.astype(np.int32)]
    cfg = EncoderConfig(width=208, height=120, qp=32)
    with decode_device_ctx():
        IntraEncoder(cfg).encode([frame])  # warm-up (jit compiles)
        t0 = time.perf_counter()
        IntraEncoder(cfg).encode([frame])
        return time.perf_counter() - t0


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
    try:
        enc_dt = _encode_once()
        enc_fps = round(1.0 / enc_dt, 4)
        enc_vs = round((1.0 / enc_dt) / VTM_ENCODE_AI_FPS, 4)
    except Exception:
        enc_fps = enc_vs = None
    print(json.dumps({
        "metric": "e2e_decode_fps_ra_full_bq416_qp37",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / VTM_DECODE_FPS, 4),
        "encode_ai_fps_small208": enc_fps,
        "encode_vs_vtm": enc_vs,
    }))


if __name__ == "__main__":
    main()
