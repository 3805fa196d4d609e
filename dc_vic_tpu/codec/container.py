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
    def encode(img_size: Tuple[int, int], max_abs_y: int, quality_ind: int) -> bytes:
        H, W = img_size
        return struct.pack(
            "<HHBB", H, W, min(255, max(0, int(max_abs_y))), int(quality_ind))

    @staticmethod
    def decode(header: bytes) -> Dict:
        H, W, max_sample, quality_ind = struct.unpack("<HHBB", header[:6])
        return {"img_size": (H, W), "max_sample": max_sample,
                "quality_ind": quality_ind}


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
