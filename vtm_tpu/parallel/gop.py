"""Segment (GOP) parallel encoding — the framework's multi-host scaling
axis (SURVEY §2.6: reference mechanism = offline segment encode + Parcat
stitch, App/Parcat/readme.md).

Frames are split at IRAP boundaries into independent segments; each
segment encodes in its own worker process (on a production deployment:
one host per segment over DCN), and the bitstreams are stitched with
vtm_tpu.apps.parcat into one stream that is bit-identical to the
sequential intra-period encode.
"""

from __future__ import annotations

import multiprocessing
import os
import tempfile
from concurrent.futures import ProcessPoolExecutor


def _encode_segment(args):
    (mode, cfg_kwargs, frames, kw) = args
    from vtm_tpu.encoder import enc_lib as E

    cfg = E.EncoderConfig(**cfg_kwargs)
    enc_cls = {
        "intra": E.IntraEncoder,
        "ldp": E.InterEncoder,
        "ldb": E.LowDelayBEncoder,
        "ra": E.RandomAccessEncoder,
    }[mode]
    enc = enc_cls(cfg, **kw)
    return enc.encode(frames)


def encode_parallel(frames, cfg_kwargs: dict, mode: str = "ldp",
                    segment_len: int = 8, workers: int | None = None,
                    enc_kwargs: dict | None = None) -> bytes:
    """Encode `frames` as ceil(N/segment_len) independent segments in
    parallel worker processes and parcat-stitch the results."""
    from vtm_tpu.apps.parcat import parcat

    segments = [frames[i : i + segment_len]
                for i in range(0, len(frames), segment_len)]
    kw = enc_kwargs or {}
    jobs = [(mode, cfg_kwargs, seg, kw) for seg in segments]
    if workers is None:
        workers = min(len(segments), os.cpu_count() or 1)
    if workers > 1 and len(segments) > 1:
        # spawn, not fork: the encoder runs jax kernels (batched RMD,
        # filter chains) whose XLA runtime threads/mutexes make a forked
        # child deadlock-prone; spawn gives each worker a clean runtime
        ctx = multiprocessing.get_context("spawn")
        with ProcessPoolExecutor(max_workers=workers, mp_context=ctx) as pool:
            streams = list(pool.map(_encode_segment, jobs))
    else:
        streams = [_encode_segment(j) for j in jobs]
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i, s in enumerate(streams):
            p = os.path.join(td, f"seg{i}.bit")
            open(p, "wb").write(s)
            paths.append(p)
        return parcat(paths)
