"""SEI message parsing (subset).

Ref: DecoderLib/SEIread.cpp xReadSEImessage:136 (0xFF-extended payload
type/size framing) and xParseSEIDecodedPictureHash:423.  Only the messages
the conformance pipeline needs are decoded; the rest are kept raw.
"""

from __future__ import annotations

from dataclasses import dataclass

SEI_DECODED_PICTURE_HASH = 132


@dataclass
class SeiMessage:
    payload_type: int
    payload: bytes


@dataclass
class DecodedPictureHash:
    hash_type: int  # 0=MD5, 1=CRC, 2=checksum
    digest: bytes


def parse_sei_rbsp(rbsp: bytes) -> list[SeiMessage]:
    msgs = []
    i = 0
    n = len(rbsp)
    # stop at rbsp trailing: last byte with stop bit; conservatively stop when
    # fewer than 2 bytes remain (type+size minimum) or only trailing bits left
    while i < n:
        if i == n - 1:  # trailing byte (0x80)
            break
        ptype = 0
        while rbsp[i] == 0xFF:
            ptype += 255
            i += 1
        ptype += rbsp[i]
        i += 1
        psize = 0
        while rbsp[i] == 0xFF:
            psize += 255
            i += 1
        psize += rbsp[i]
        i += 1
        msgs.append(SeiMessage(ptype, rbsp[i : i + psize]))
        i += psize
    return msgs


def parse_decoded_picture_hash(payload: bytes) -> DecodedPictureHash:
    return DecodedPictureHash(payload[0], payload[1:])
