"""Slice-data decoding: CABAC CTU loop (DecSlice.cpp decompressSlice:73).

Parses and reconstructs each CTU of the slice.  Substream extraction for
tiles/WPP mirrors DecSlice.cpp:113.
"""

from __future__ import annotations


def decompress_slice(dec, sps, pps, ph, sh, r) -> None:
    from vtm_tpu.decoder.ctu_decoder import CtuDecoder

    CtuDecoder(dec, sps, pps, ph, sh).decode(r)
