"""Generate deterministic synthetic YUV test clips.

Content mixes gradients, edges, textured noise, and motion so intra and
inter coding tools all get exercised.  Seeded — the clips are reproducible
and small enough to regenerate rather than commit.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vtm_tpu.common.types import ChromaFormat
from vtm_tpu.utils.yuv_io import YuvFormat, write_yuv


def synth_clip(w: int, h: int, frames: int, seed: int = 7, bit_depth: int = 8):
    rng = np.random.default_rng(seed)
    maxv = (1 << bit_depth) - 1
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    # static base: diagonal gradient + circles + blocky texture
    base = 0.35 * maxv * (xx / w + yy / h) / 2
    cx, cy = w * 0.6, h * 0.4
    r = np.hypot(xx - cx, yy - cy)
    base += 0.3 * maxv * (np.sin(r / 6.0) * 0.5 + 0.5)
    tex = rng.normal(0, 0.04 * maxv, (h, w))
    # low-pass the noise so it codes like natural texture
    k = np.ones((3, 3)) / 9.0
    from scipy.signal import convolve2d  # noqa: PLC0415

    tex = convolve2d(tex, k, mode="same", boundary="symm")
    out = []
    for t in range(frames):
        dx, dy = 1.5 * t, 0.8 * t
        mov = 0.25 * maxv * (np.sin((xx - dx) / 9.0) * np.cos((yy - dy) / 11.0) * 0.5 + 0.5)
        y = np.clip(base + mov + tex, 0, maxv)
        # chroma: smooth fields with some correlation to luma
        ch, cw = h // 2, w // 2
        u = np.clip(maxv * 0.5 + 0.2 * maxv * np.sin((xx[:ch, :cw] + t) / 17.0), 0, maxv)
        v = np.clip(maxv * 0.5 + 0.2 * maxv * np.cos((yy[:ch, :cw] - t) / 13.0), 0, maxv)
        out.append([np.round(y).astype(np.int32), np.round(u).astype(np.int32), np.round(v).astype(np.int32)])
    return out


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "testdata"
    os.makedirs(outdir, exist_ok=True)
    for w, h, n, name in [(64, 64, 5, "tiny64"), (208, 120, 3, "small208"), (416, 240, 8, "bq416")]:
        clip = synth_clip(w, h, n)
        fmt = YuvFormat(w, h, ChromaFormat.YUV420, 8)
        path = os.path.join(outdir, f"{name}_{w}x{h}_420_8.yuv")
        write_yuv(path, clip, fmt)
        print(path, os.path.getsize(path))


if __name__ == "__main__":
    main()
