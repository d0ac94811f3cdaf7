"""CTU-level decode: CABAC parsing + reconstruction.

Temporary scaffold — the CABAC engine and coding-tree parser land next.
"""

from __future__ import annotations


class CtuDecoder:
    def __init__(self, dec, sps, pps, ph, sh):
        self.dec = dec
        self.sps = sps
        self.pps = pps
        self.ph = ph
        self.sh = sh

    def decode(self, r) -> None:
        raise NotImplementedError("CTU decoding not implemented yet")
