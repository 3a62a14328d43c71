"""Minimal TensorBoard scalar-event writer (no tensorboard dependency).

The reference logs scalars through Lightning's TensorBoardLogger
(``train.py:132``, ``core.py:121-141``). This writes the same
``events.out.tfevents.*`` files directly: TFRecord framing (length +
masked-crc32c) around hand-encoded Event protobufs with
``Summary.Value.simple_value`` scalars — loadable by any TensorBoard.

Only the scalar subset is implemented (all the reference ever logs).
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Optional

# --- crc32c (Castagnoli), table-driven -----------------------------------

_CRC_TABLE = []


def _build_table():
    poly = 0x82F63B78
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        _CRC_TABLE.append(crc)


_build_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- minimal protobuf encoding -------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint(field << 3 | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _double(field: int, value: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", value)


def _float(field: int, value: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", value)


def _int64(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(value & 0xFFFFFFFFFFFFFFFF)


def _scalar_event(tag: str, value: float, step: int, wall_time: float) -> bytes:
    # Summary.Value{ tag=1, simple_value=2 }
    v = _len_delim(1, tag.encode()) + _float(2, float(value))
    summary = _len_delim(1, v)  # Summary{ value=1 (repeated) }
    # Event{ wall_time=1 (double), step=2 (int64), summary=5 }
    return _double(1, wall_time) + _int64(2, step) + _len_delim(5, summary)


def _version_event(wall_time: float) -> bytes:
    # Event{ wall_time=1, file_version=3 (string) }
    return _double(1, wall_time) + _len_delim(3, b"brain.Event:2")


class SummaryWriter:
    """Append-only scalar event writer, TensorBoard-compatible."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = (
            f"events.out.tfevents.{int(time.time())}."
            f"{socket.gethostname()}.{os.getpid()}.0"
        )
        self._f = open(os.path.join(logdir, fname), "ab")
        self._write_record(_version_event(time.time()))

    def _write_record(self, data: bytes):
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))
        self._f.flush()

    def add_scalar(self, tag: str, value: float, step: int,
                   wall_time: Optional[float] = None):
        self._write_record(
            _scalar_event(tag, value, step, wall_time or time.time())
        )

    def close(self):
        self._f.close()


def read_scalars(path: str):
    """Parse scalar events back out of a tfevents file (for tests/tools)."""
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "header crc mismatch"
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data), "data crc mismatch"
            out.extend(_parse_event(data))
    return out


def _parse_event(data: bytes):
    """Extract (tag, value, step) scalars from one Event message."""
    i = 0
    step = 0
    scalars = []

    def read_varint(buf, i):
        n = shift = 0
        while True:
            b = buf[i]
            i += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n, i
            shift += 7

    while i < len(data):
        key, i = read_varint(data, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, i = read_varint(data, i)
            if field == 2:
                step = val
        elif wire == 1:
            i += 8
        elif wire == 5:
            i += 4
        elif wire == 2:
            ln, i = read_varint(data, i)
            payload = data[i : i + ln]
            i += ln
            if field == 5:  # summary
                j = 0
                while j < len(payload):
                    k2, j = read_varint(payload, j)
                    if k2 >> 3 == 1 and k2 & 7 == 2:  # Value
                        vlen, j = read_varint(payload, j)
                        vbuf = payload[j : j + vlen]
                        j += vlen
                        tag, simple = None, None
                        m = 0
                        while m < len(vbuf):
                            k3, m = read_varint(vbuf, m)
                            if k3 >> 3 == 1 and k3 & 7 == 2:
                                tl, m = read_varint(vbuf, m)
                                tag = vbuf[m : m + tl].decode()
                                m += tl
                            elif k3 >> 3 == 2 and k3 & 7 == 5:
                                (simple,) = struct.unpack(
                                    "<f", vbuf[m : m + 4]
                                )
                                m += 4
                            else:
                                break
                        if tag is not None and simple is not None:
                            scalars.append((tag, simple, step))
                    else:
                        break
        else:
            break
    return scalars
