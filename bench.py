"""Driver benchmark entry point — prints ONE JSON line.

END-TO-END metric: full decode throughput (CABAC parse + MV derivation on
host, batched MC/DMVR/BDOF + whole-plane deblock/SAO/ALF device kernels)
of the reference RA bitstream ra_full_bq416_qp37 (8 frames, 416x240, full
VVC inter toolset), decoded-picture-hash verified.

vs_baseline compares against the reference DecoderApp single-thread decode
of the same stream.  The anchor is MEASURED at bench time when the
reference binary is present (its own "Total Time" meter,
source/App/DecoderApp/DecApp.cpp:76); otherwise the last measured value
for this host is used and flagged.

The JSON also reports which jax backend executed the device kernels and
the decode placement decision (vtm_tpu/common/exec_mode.py), so a CPU
fallback can never masquerade as a TPU result.
"""

import json
import os
import re
import subprocess
import time

# last hand-measured anchors for this host (used when the reference
# binaries are absent; see BASELINE.md)
VTM_DECODE_FPS_FALLBACK = 72.7  # DecoderApp "Total Time" 0.110 s / 8 frames
VTM_ENCODE_AI_FPS_FALLBACK = 1 / 3.046  # EncoderApp AI small208 qp32
# 1080p AI qp37: VTM EncoderApp "Total Time" 81.7 s / 2 frames on this host
# (testdata/ai_full_hd1080_qp37.enc.log); ours last measured 24.9 s/frame
# with the batched FrameRMD + whole-frame partition DP on the tunnel TPU.
VTM_ENCODE_HD1080_AI_FPS = 0.0245
HD1080_AI_FPS_LAST_MEASURED = 0.0402

VTM_BIN = "/tmp/vtm-src/bin/ninja/gcc-12.2/x86_64/release"


def measure_vtm_decode_fps(stream: str, frames: int):
    dec = os.path.join(VTM_BIN, "DecoderApp")
    if not os.path.exists(dec):
        return VTM_DECODE_FPS_FALLBACK, "fallback"
    try:
        best = None
        for _ in range(3):
            out = subprocess.run(
                [dec, "-b", stream, "-o", "/dev/null"],
                capture_output=True, text=True, timeout=120).stdout
            m = re.search(r"Total Time:\s+([0-9.]+)\s+sec", out)
            if not m:
                return VTM_DECODE_FPS_FALLBACK, "fallback"
            t = float(m.group(1))
            best = t if best is None else min(best, t)
        return frames / best, "measured"
    except Exception:
        return VTM_DECODE_FPS_FALLBACK, "fallback"


def measure_vtm_encode_ai_fps():
    """EncoderApp AI, 1 frame of small208 at QP32 (matching _encode_once)."""
    enc = os.path.join(VTM_BIN, "EncoderApp")
    cfg = "/root/reference/cfg/encoder_intra_vtm.cfg"
    if not (os.path.exists(enc) and os.path.exists(cfg)):
        return VTM_ENCODE_AI_FPS_FALLBACK, "fallback"
    try:
        t0 = time.perf_counter()
        subprocess.run(
            [enc, "-c", cfg, "--InputFile=testdata/small208_208x120_420_8.yuv",
             "--SourceWidth=208", "--SourceHeight=120", "--FrameRate=30",
             "--FramesToBeEncoded=1", "--QP=32", "--IntraPeriod=1",
             "--TemporalSubsampleRatio=1", "--BitstreamFile=/dev/null",
             "--SEIDecodedPictureHash=1"],
            capture_output=True, text=True, timeout=300, check=True)
        return 1.0 / (time.perf_counter() - t0), "measured"
    except Exception:
        return VTM_ENCODE_AI_FPS_FALLBACK, "fallback"


def _decode_once():
    from vtm_tpu.decoder.declib import Decoder

    with open("testdata/ra_full_bq416_qp37.bit", "rb") as f:
        data = f.read()
    dec = Decoder()
    pics = dec.decode_stream(data)
    mismatches = sum(1 for hr in dec.hash_results if not hr.ok)
    assert len(dec.hash_results) == len(pics)
    return len(pics), mismatches


def _read_420(path, w, h):
    import numpy as np

    with open(path, "rb") as f:
        raw = f.read(w * h * 3 // 2)
    y = np.frombuffer(raw[: w * h], np.uint8).reshape(h, w)
    u = np.frombuffer(raw[w * h : w * h * 5 // 4], np.uint8).reshape(
        h // 2, w // 2)
    v = np.frombuffer(raw[w * h * 5 // 4 :], np.uint8).reshape(h // 2, w // 2)
    return [p.astype(np.int32) for p in (y, u, v)]


def _encode_once() -> tuple:
    """AI encode of one small208 frame; returns (seconds, rmd device)."""
    from vtm_tpu.common.exec_mode import decode_device_ctx
    from vtm_tpu.encoder import rmd_tpu
    from vtm_tpu.encoder.enc_lib import EncoderConfig, IntraEncoder

    frame = _read_420("testdata/small208_208x120_420_8.yuv", 208, 120)
    cfg = EncoderConfig(width=208, height=120, qp=32)
    dev = rmd_tpu.accel_device()
    with decode_device_ctx():
        IntraEncoder(cfg).encode([frame])  # warm-up (jit compiles)
        t0 = time.perf_counter()
        IntraEncoder(cfg).encode([frame])
        return (time.perf_counter() - t0,
                str(dev.platform) if dev is not None else "cpu")


def _decode_hd1080() -> float | None:
    """Decode throughput of the 1080p AI golden (north-star resolution)."""
    from vtm_tpu.decoder.declib import Decoder

    path = "testdata/ai_full_hd1080_qp37.bit"
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        data = f.read()
    dec = Decoder()
    pics = dec.decode_stream(data)  # warm-up + hash check
    if any(not hr.ok for hr in dec.hash_results):
        return None
    t0 = time.perf_counter()
    dec = Decoder()
    pics = dec.decode_stream(data)
    return len(pics) / (time.perf_counter() - t0)


def _encode_hd1080_once() -> float:
    """AI encode of one 1080p frame at QP37 (north-star config); opt-in
    via VTM_TPU_BENCH_HD=1 (first compile of the 1080p class kernels is
    several minutes on the tunnel backend)."""
    from vtm_tpu.common.exec_mode import decode_device_ctx
    from vtm_tpu.encoder.enc_lib import EncoderConfig, IntraEncoder

    frame = _read_420("testdata/hd1080_1920x1080_420_8.yuv", 1920, 1080)
    cfg = EncoderConfig(width=1920, height=1080, qp=37)
    with decode_device_ctx():
        IntraEncoder(cfg).encode([frame])
        t0 = time.perf_counter()
        IntraEncoder(cfg).encode([frame])
        return time.perf_counter() - t0


def main():
    import jax

    from vtm_tpu.common import exec_mode

    anchor_fps, anchor_src = measure_vtm_decode_fps(
        "testdata/ra_full_bq416_qp37.bit", 8)
    # warm-up: first pass compiles every kernel shape
    n, bad = _decode_once()
    assert bad == 0, f"hash mismatches: {bad}"
    # best-of-3, matching the anchor measurement's methodology above
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        n, bad = _decode_once()
        assert bad == 0
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    fps = n / best
    placement = exec_mode.decode_placement()
    exec_backend = ("cpu" if placement == "cpu" else jax.default_backend())
    enc_anchor_fps, enc_anchor_src = measure_vtm_encode_ai_fps()
    try:
        # best-of-3: a single sample is at the mercy of tunnel latency
        # jitter (25 ms/fetch nominal, occasionally far worse)
        enc_dt, enc_dev = _encode_once()
        for _ in range(2):
            dt2, _dev2 = _encode_once()
            enc_dt = min(enc_dt, dt2)
        enc_fps = round(1.0 / enc_dt, 4)
        enc_vs = round((1.0 / enc_dt) / enc_anchor_fps, 4)
    except Exception:
        enc_fps = enc_vs = None
        enc_dev = "error"
    try:
        hd_dec_fps = _decode_hd1080()
    except Exception:
        hd_dec_fps = None
    hd_fps = HD1080_AI_FPS_LAST_MEASURED
    hd_src = "last-measured"
    if os.environ.get("VTM_TPU_BENCH_HD"):
        try:
            hd_fps = round(1.0 / _encode_hd1080_once(), 4)
            hd_src = "measured"
        except Exception:
            hd_fps, hd_src = None, "error"
    print(json.dumps({
        "metric": "e2e_decode_fps_ra_full_bq416_qp37",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / anchor_fps, 4),
        "decode_backend": exec_backend,
        "decode_placement": placement,
        "jax_default_backend": jax.default_backend(),
        "anchor_decode_fps": round(anchor_fps, 2),
        "anchor_source": anchor_src,
        "encode_ai_fps_small208": enc_fps,
        "encode_vs_vtm": enc_vs,
        "encode_placement": enc_dev,
        "encode_ai_fps_hd1080": hd_fps,
        "hd1080_source": hd_src,
        "anchor_encode_ai_fps_hd1080": VTM_ENCODE_HD1080_AI_FPS,
        "decode_fps_hd1080": (round(hd_dec_fps, 3)
                              if hd_dec_fps is not None else None),
        "anchor_encode_ai_fps": round(enc_anchor_fps, 4),
        "anchor_encode_source": enc_anchor_src,
    }))


if __name__ == "__main__":
    main()
