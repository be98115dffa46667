"""Pure-stdlib WAV (RIFF PCM-16) audio codec.

Companion to ``imageio.py``: real byte-level decode of an opaque
``binary`` audio column. PCM WAV is a RIFF container — chunked layout
(fmt / data), little-endian int16 interleaved frames — implementable
exactly from the public RIFF/WAVE spec with ``struct`` + numpy. The
``audio_decode`` gate encodes deterministic samples in one Arrow stage
and decodes them in a separate stage, so any error in the chunk walk,
header arithmetic, or sample layout breaks the DuckDB oracle hash.

Resampling / lossy codecs (mp3, opus) remain honestly out of scope —
they need ffmpeg-class dependencies not in this container.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode an (n,) or (n, ch) int16 array as a PCM-16 WAV file."""
    arr = np.ascontiguousarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()  # interleaved frames, little-endian int16
    fmt = struct.pack(
        "<HHIIHH",
        1,                 # PCM
        ch,
        rate,
        rate * ch * 2,     # byte rate
        ch * 2,            # block align
        16,                # bits per sample
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM-16 WAV to (sample_rate, (n, ch) int16 array).

    Walks the RIFF chunk list properly (chunks are word-aligned and may
    appear in any order / with extras like LIST), validates the
    container and format fields."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_len,) = struct.unpack_from("<I", data, 4)
    if riff_len + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= min(len(data), riff_len + 8):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, 0)
        elif tag == b"data":
            pcm = payload
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits})"
        )
    if block_align != ch * 2:
        raise ValueError("block align inconsistent with channels")
    n = len(pcm) // (ch * 2)
    arr = np.frombuffer(pcm, dtype="<i2", count=n * ch).reshape(n, ch)
    return rate, arr.astype(np.int16)
