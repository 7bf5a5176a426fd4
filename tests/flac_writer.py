"""Minimal FLAC encoder for testing native/audioio.cc.

Writes spec-conformant streams (modulo CRC fields, which the decoder does not
verify) with a choice of subframe types so every decode path is exercised:
constant, verbatim, fixed-order 0-2 rice-coded, LPC, and the stereo channel
assignments (independent / left-side / mid-side).
"""

from __future__ import annotations

import struct
from typing import List, Sequence

import numpy as np


class BitWriter:
    def __init__(self):
        self.bits: List[int] = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _rice_encode(bw: BitWriter, residuals: Sequence[int], param: int):
    bw.write(0, 2)  # method 0: 4-bit rice
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    for v in residuals:
        u = 2 * v if v >= 0 else -2 * v - 1
        bw.write_unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


def _write_subframe(bw: BitWriter, samples: np.ndarray, bps: int, kind: str):
    bw.write(0, 1)  # reserved
    x = [int(v) for v in samples]
    if kind == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(x[0], bps)
    elif kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write_signed(v, bps)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(v, bps)
        res = []
        for i in range(order, len(x)):
            if order == 0:
                pred = 0
            elif order == 1:
                pred = x[i - 1]
            else:
                pred = 2 * x[i - 1] - x[i - 2]
            res.append(x[i] - pred)
        _rice_encode(bw, res, param=max(0, int(np.log2(np.mean(np.abs(res)) + 1)) + 1) if res else 0)
    elif kind == "lpc":
        order, precision, shift = 2, 12, 5
        coefs = [40, -12]  # arbitrary fixed-point predictor
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(v, bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        res = []
        for i in range(order, len(x)):
            acc = sum(c * x[i - j - 1] for j, c in enumerate(coefs))
            res.append(x[i] - (acc >> shift))
        _rice_encode(bw, res, param=max(0, int(np.log2(np.mean(np.abs(res)) + 1)) + 1) if res else 0)
    else:
        raise ValueError(kind)


def write_flac(
    path: str,
    channels: List[np.ndarray],  # int16-range int arrays, one per channel
    sample_rate: int = 16000,
    blocksize: int = 4096,
    kind: str = "verbatim",
    stereo_mode: str = "independent",  # 'independent' | 'left_side' | 'mid_side'
):
    n = len(channels[0])
    n_ch = len(channels)
    bps = 16

    header = bytearray(b"fLaC")
    si = BitWriter()
    si.write(blocksize, 16)  # min blocksize
    si.write(blocksize, 16)  # max blocksize
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si_bytes = si.bytes() + b"\x00" * 16  # md5 zeros
    header += bytes([0x80, 0, 0, len(si_bytes)]) + si_bytes

    body = bytearray()
    for f, start in enumerate(range(0, n, blocksize)):
        chunk = [c[start : start + blocksize] for c in channels]
        bs = len(chunk[0])
        bw = BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)  # blocksize: 16-bit value follows
        bw.write(0, 4)  # sample rate: from streaminfo
        if n_ch == 1 or stereo_mode == "independent":
            bw.write(n_ch - 1, 4)
        elif stereo_mode == "left_side":
            bw.write(8, 4)
        elif stereo_mode == "mid_side":
            bw.write(10, 4)
        bw.write(4, 3)  # 16-bit samples
        bw.write(0, 1)  # reserved
        # UTF-8 frame number
        if f < 0x80:
            bw.write(f, 8)
        else:
            bw.write(0xC0 | (f >> 6), 8)
            bw.write(0x80 | (f & 0x3F), 8)
        bw.write(bs - 1, 16)
        bw.write(0, 8)  # CRC-8 (not verified by our decoder)

        if n_ch == 1 or stereo_mode == "independent":
            for c in chunk:
                _write_subframe(bw, c, bps, kind)
        elif stereo_mode == "left_side":
            side = chunk[0].astype(np.int64) - chunk[1].astype(np.int64)
            _write_subframe(bw, chunk[0], bps, kind)
            _write_subframe(bw, side, bps + 1, kind)
        elif stereo_mode == "mid_side":
            l = chunk[0].astype(np.int64)
            r = chunk[1].astype(np.int64)
            mid = (l + r) >> 1
            side = l - r
            _write_subframe(bw, mid, bps, kind)
            _write_subframe(bw, side, bps + 1, kind)
        bw.align()
        bw.write(0, 16)  # CRC-16 (not verified)
        body += bw.bytes()

    with open(path, "wb") as fh:
        fh.write(bytes(header) + bytes(body))


def write_wav(path: str, wav: np.ndarray, sample_rate: int = 16000):
    """16-bit PCM mono WAV."""
    pcm = np.clip(np.asarray(wav), -32768, 32767).astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                      sample_rate * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)
