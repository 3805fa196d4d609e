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
               tpu_format: bool = False, lanes: int = 128,
               esc_dense: bool = False) -> bytes:
        """quality byte bit 7 marks the device-coded 'tpu' stream format
        (ops/rans_device.py); bits 0-6 are the quality index. For the tpu
        format the third byte carries log2 of the interleave-lane cap in
        bits 0-6 and, in bit 7, the dense-escape flag: set when some section
        has more escapes than ops/rans_device.esc_cap() so the decoder must
        use the dense (uncapped) escape epilogue. (The reference writes
        max|y_hat| in this byte and never reads it back,
        src/utils/codec_utils.py)."""
        H, W = img_size
        if not 0 <= int(quality_ind) < 128:
            raise ValueError(
                f"quality_ind {quality_ind} out of range [0, 128): bit 7 of "
                "the quality byte is the stream-format flag")
        qb = int(quality_ind) | (0x80 if tpu_format else 0)
        b3 = ((int(lanes).bit_length() - 1) | (0x80 if esc_dense else 0)
              if tpu_format else min(255, max(0, int(max_abs_y))))
        return struct.pack("<HHBB", H, W, b3, qb)

    @staticmethod
    def decode(header: bytes) -> Dict:
        H, W, b3, qb = struct.unpack("<HHBB", header[:6])
        tpu = bool(qb & 0x80)
        return {"img_size": (H, W),
                "max_sample": None if tpu else b3,
                "lanes": (1 << (b3 & 0x7F)) if tpu else None,
                "esc_dense": bool(b3 & 0x80) if tpu else None,
                "quality_ind": qb & 0x7F,
                "stream_format": "tpu" if tpu else "compressai"}


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
