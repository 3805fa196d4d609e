"""Bitstream header and .bin container (ref: src/utils/codec_utils.py).

Header (6 bytes): H, W as uint16 LE; max(|y_hat|) as uint8 (written for
format parity, unused on decode); quality index as uint8.
Container: for each of [header, z_string, y_string], a uint32 LE length
followed by the raw bytes.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Tuple


class HeaderHandler:
    SIZE = 6

    @staticmethod
    def encode(img_size: Tuple[int, int], max_abs_y: int, quality_ind: int,
               tpu_format: bool = False) -> bytes:
        """quality byte bit 7 marks the device-coded 'tpu' stream format
        (ops/rans_device.py); bits 0-6 are the quality index."""
        H, W = img_size
        qb = int(quality_ind) | (0x80 if tpu_format else 0)
        return struct.pack(
            "<HHBB", H, W, min(255, max(0, int(max_abs_y))), qb)

    @staticmethod
    def decode(header: bytes) -> Dict:
        H, W, max_sample, qb = struct.unpack("<HHBB", header[:6])
        return {"img_size": (H, W), "max_sample": max_sample,
                "quality_ind": qb & 0x7F,
                "stream_format": "tpu" if qb & 0x80 else "compressai"}


def save_byte_strings(path: str, strings: List[bytes]) -> None:
    with open(path, "wb") as f:
        for s in strings:
            f.write(struct.pack("<I", len(s)))
            f.write(s)


def load_byte_strings(path: str) -> List[bytes]:
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if not head:
                break
            (n,) = struct.unpack("<I", head)
            out.append(f.read(n))
    return out
