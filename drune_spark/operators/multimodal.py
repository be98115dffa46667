"""Multimodal (image/audio/video) column plumbing (driver extension).

Media are opaque ``binary`` columns with typed metadata alongside. The
Spark-side machinery — schema, Arrow-batched ``mapInPandas`` transforms,
partition sizing — is real and tested, and so are the codecs: PNG
(all 5 filters) + BMP via zlib/struct (operators/imageio.py, gate
``image_decode``), RIFF PCM-16 WAV (audioio.py, gate ``audio_decode``),
and uncompressed 24-bit AVI (videoio.py, gate ``video_decode``). Only
COMPRESSED video (H.264/VP9) is out of scope — it needs ffmpeg-class
dependencies absent from this container; adding one would change only
the inner decode function: the Arrow batch flow, the output schema, and
the partitioning strategy stay identical.

Scale notes: media rows are huge (MBs), so ``spark.sql.files.
maxPartitionBytes`` should be raised and rows-per-batch bounded via
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set small, e.g. 32, so
an Arrow batch of decoded frames fits in executor memory). Feature
extraction keys nothing — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id bigint, kind string, n_bytes bigint, sha256 string, feature array<double>"


def _ids_wide(df: DataFrame, id_col: str) -> DataFrame:
    """Fan the id projection out to full parallelism before an EXPENSIVE
    synthesize kernel. A small parquet table arrives as ONE input split,
    and a mapInPandas chain is narrow — so synth + decode both ran
    single-task (r10 optimization profile: image_resize = 2 tasks,
    ~3.6 s of task time on one core). The repartition shuffles only the
    id column; every downstream Arrow stage inherits the width
    shuffle-free. Per-row outputs are partitioning-independent, so
    results are unchanged.

    Applied ONLY where the downstream kernels are multi-second
    (neardup images/videos: 18×16 pixel codecs + dHash resizes; JPEG
    DCT/Huffman both directions) — measured steady wins of 1.0-3.4 s
    each at sf0.1. The cheap producers (tiny 4-6 px PNGs, 64-100-frame
    WAVs) stay narrow: for sub-second kernels the 32-task fan-out costs
    MORE than it saves (~+1-2 s of exchange + per-partition Arrow/python
    round-trips; audio_neardup measured 0.9 s → 1.8 s, media_quarantine
    1.0 s → 3.1 s when fanned). At 100 TB input splits are plentiful and
    this helper is a no-op (fan_out only widens below the target)."""
    from drune_spark.functions.partitioning import fan_out

    return fan_out(df.select(id_col))


def decode_image(content: bytes) -> np.ndarray:
    """Decode PNG or 24-bit BMP bytes to an (h, w, ch) uint8 array —
    REAL codecs (zlib inflate + all five PNG row filters / struct BMP
    rows), pure stdlib+numpy; see operators/imageio.py. Formats beyond
    these two would use Pillow in a real deployment."""
    from drune_spark.operators.imageio import sniff_and_decode

    return sniff_and_decode(content)


def fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: byte-histogram
    moments. Same output on any worker — lets the pipeline be tested
    end-to-end without a codec.

    Vectorized: position-bucketed byte sums via one numpy pass instead
    of dim Python generator sweeps (~50× less interpreter work per row;
    this showed up as the whole cost of the bench entry)."""
    if not content:
        return [0.0] * dim
    step = max(1, len(content) // 1024)
    sample = np.frombuffer(content[::step], dtype=np.uint8)
    pad = (-len(sample)) % dim
    if pad:
        sample = np.concatenate([sample, np.zeros(pad, dtype=np.uint8)])
    sums = sample.reshape(-1, dim).sum(axis=0, dtype=np.int64)
    return [float(s % 997) / 997.0 for s in sums]


def attach_binary(df: DataFrame, source_col: str, kind: str = "text") -> DataFrame:
    """Wrap an existing column as a media-style binary payload with
    metadata — the ingestion shape for real image/audio bytes."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(source_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )


def extract_features(
    media: DataFrame,
    featurizer: Callable[[bytes], list[float]] = fake_feature,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams column batches; each batch is processed in
    Python once (not per-row), and the binary column is dropped on output
    so only small feature rows shuffle onward. Input is fanned across
    cores so one Python worker per core decodes in parallel.
    """
    import hashlib

    from drune_spark.functions.partitioning import fan_out
    media = fan_out(media)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "sha256": content.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": content.map(lambda b: featurizer(b or b"")),
                }
            )

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)


def synth_pixels(doc_id: int) -> np.ndarray:
    """Deterministic RGB test image for a document id: closed-form
    pixels so a DuckDB oracle can recompute every decoded feature
    exactly (w = 4 + id%5, h = 3 + id%4, px[y,x,c] =
    (7·id + 3x + 5y + 11c) mod 256). h spans 3..6 so the cycling PNG
    encoder emits every filter type 0-4 across the corpus."""
    w = 4 + doc_id % 5
    h = 3 + doc_id % 4
    idx = np.arange(h * w * 3, dtype=np.int64)
    c = idx % 3
    x = (idx // 3) % w
    y = idx // (3 * w)
    return ((doc_id * 7 + 3 * x + 5 * y + 11 * c) % 256).reshape(
        h, w, 3
    ).astype(np.uint8)


def synthesize_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode one real PNG per row (media_id, content binary) — the
    ingestion half of the image round-trip gate. Arrow-batched, no
    shuffle; each image is encoded once per row inside the batch."""
    from drune_spark.operators.imageio import encode_png

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({
                "media_id": ids,
                "content": [
                    encode_png(synth_pixels(int(i))) for i in ids
                ],
            })

    return df.select(id_col).mapInPandas(
        gen, schema="media_id bigint, content binary"
    )


def synth_samples(doc_id: int) -> tuple[int, np.ndarray]:
    """Deterministic PCM test clip for a document id, closed-form so a
    DuckDB oracle recomputes every decoded feature exactly:
    n = 64 + id%37 frames, ch = 1 + id%2, rate = 8000 + (id%3)*4000,
    s[i,c] = ((13·id + 7i + 5c) mod 4096) − 2048."""
    n = 64 + doc_id % 37
    ch = 1 + doc_id % 2
    rate = 8000 + (doc_id % 3) * 4000
    i = np.arange(n, dtype=np.int64)[:, None]
    c = np.arange(ch, dtype=np.int64)[None, :]
    s = ((doc_id * 13 + 7 * i + 5 * c) % 4096) - 2048
    return rate, s.astype(np.int16)


def synthesize_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode one real PCM-16 WAV per row (media_id, content binary)."""
    from drune_spark.operators.audioio import encode_wav

    def one(doc_id: int) -> bytes:
        rate, samples = synth_samples(doc_id)
        return encode_wav(samples, rate)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({
                "media_id": ids,
                "content": [one(int(i)) for i in ids],
            })

    return df.select(id_col).mapInPandas(
        gen, schema="media_id bigint, content binary"
    )


AUDIO_FEATURE_SCHEMA = (
    "media_id bigint, sample_rate int, n_samples int, n_channels int, "
    "duration_us bigint, amp_sum bigint, abs_sum bigint, wsum bigint"
)


def audio_features(media: DataFrame) -> DataFrame:
    """REAL WAV decode (operators/audioio.py RIFF chunk walk) + exact
    integer sample statistics; ``wsum`` = Σ s[i]·(i+1) over the
    interleaved frame-major stream is order-sensitive, proving full
    sample fidelity. Shuffle-free mapInPandas."""
    from drune_spark.operators.audioio import decode_wav

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                rate, arr = decode_wav(bytes(content))
                n, ch = arr.shape
                flat = arr.astype(np.int64).ravel()
                rows.append({
                    "media_id": int(mid),
                    "sample_rate": rate,
                    "n_samples": n,
                    "n_channels": ch,
                    "duration_us": n * 1_000_000 // rate,
                    "amp_sum": int(flat.sum()),
                    "abs_sum": int(np.abs(flat).sum()),
                    "wsum": int(
                        (flat * np.arange(1, flat.size + 1)).sum()
                    ),
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(proc, schema=AUDIO_FEATURE_SCHEMA)


AUDIO_VAD_SCHEMA = (
    "media_id bigint, n_frames bigint, n_speech bigint, "
    "speech_ppm bigint, energy_wsum bigint"
)


def audio_vad(
    media: DataFrame,
    frame_len: int = 16,
    threshold_per_sample: int = 1_400_000,
) -> DataFrame:
    """Energy-based voice-activity detection — the first screen of any
    speech-data curation pipeline (drop silence/noise-only clips,
    meter speech density per source). REAL WAV decode
    (operators/audioio.py), then frames of ``frame_len`` time steps:
    frame energy = Σ v² over every sample (all channels) in the frame,
    speech iff energy > threshold_per_sample · samples_in_frame. The
    trailing partial frame is kept (its threshold scales with its true
    sample count), so short clips aren't silently truncated.

    All-integer outputs; ``energy_wsum`` = Σ energy_f·(f+1) is
    order-sensitive across frames, so a single mis-framed sample breaks
    the oracle hash. Shuffle-free mapInPandas — at 100 TB this is
    embarrassingly parallel over binary rows, and only the 5-column
    feature rows leave the stage.

    Returns (media_id, n_frames, n_speech, speech_ppm, energy_wsum).
    """
    from drune_spark.operators.audioio import decode_wav

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _rate, arr = decode_wav(bytes(content))
                n, ch = arr.shape
                sq = (arr.astype(np.int64) ** 2).sum(axis=1)
                n_frames = (n + frame_len - 1) // frame_len
                energies, n_speech, wsum = [], 0, 0
                for f in range(n_frames):
                    seg = sq[f * frame_len:(f + 1) * frame_len]
                    e = int(seg.sum())
                    if e > threshold_per_sample * seg.size * ch:
                        n_speech += 1
                    wsum += e * (f + 1)
                    energies.append(e)
                rows.append({
                    "media_id": int(mid),
                    "n_frames": n_frames,
                    "n_speech": n_speech,
                    # zero-sample clip (valid RIFF, empty data chunk):
                    # report 0 rather than fail the whole Arrow batch
                    "speech_ppm": (
                        n_speech * 1_000_000 // n_frames
                        if n_frames else 0
                    ),
                    "energy_wsum": wsum,
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(proc, schema=AUDIO_VAD_SCHEMA)


# n_samples here counts INTERLEAVED values (frames × channels) — the
# grain clipping is measured at — unlike audio_features.n_samples,
# which counts frames per channel. Join the two censuses on media_id
# with that 2x-on-stereo difference in mind.
AUDIO_CLIP_SCHEMA = (
    "media_id bigint, n_samples bigint, n_clipped bigint, "
    "clip_ppm bigint, clip_pos_sum bigint"
)


def audio_clipping(
    media: DataFrame,
    gain_milli: int = 20_000,
    full_scale: int = 32_767,
) -> DataFrame:
    """Clipping census under a gain stage — the loudness-normalization
    audit a speech pipeline runs before amplifying a corpus: a sample
    clips when ``|s · gain_milli / 1000|`` exceeds int16 full scale.
    Integer throughout (``s·gain_milli`` then compare against
    ``full_scale·1000`` — no division, no rounding ambiguity).

    ``clip_pos_sum`` = Σ (i+1) over clipped positions of the
    interleaved frame-major stream is order-sensitive, so the oracle
    hash proves exactly WHICH samples clip, not just how many (the
    audio_vad wsum discipline). Shuffle-free mapInPandas; only the
    5-column census rows leave the stage.

    Returns (media_id, n_samples, n_clipped, clip_ppm, clip_pos_sum).
    """
    from drune_spark.operators.audioio import decode_wav

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            bound = full_scale * 1000
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _rate, arr = decode_wav(bytes(content))
                flat = arr.astype(np.int64).ravel()
                n = int(flat.size)
                clipped = np.abs(flat * gain_milli) > bound
                n_clip = int(clipped.sum())
                pos_sum = int(
                    (np.flatnonzero(clipped).astype(np.int64) + 1).sum()
                )
                rows.append({
                    "media_id": int(mid),
                    "n_samples": n,
                    "n_clipped": n_clip,
                    "clip_ppm": n_clip * 1_000_000 // n if n else 0,
                    "clip_pos_sum": pos_sum,
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(proc, schema=AUDIO_CLIP_SCHEMA)


IMAGE_FEATURE_SCHEMA = (
    "media_id bigint, width int, height int, channels int, "
    "px_sum bigint, wsum bigint, r_sum bigint, g_sum bigint, b_sum bigint"
)


def image_features(media: DataFrame) -> DataFrame:
    """REAL image decode (PNG/BMP, operators/imageio.py) + exact integer
    pixel statistics. ``wsum`` is the position-weighted checksum
    Σ px[i]·(i+1) over the row-major flattened array — order-sensitive,
    so any mis-decoded byte anywhere breaks the oracle hash, proving
    full pixel fidelity (not just totals). All-integer outputs → exact
    cross-engine comparison. Decode is embarrassingly parallel in
    mapInPandas; only small feature rows leave the stage."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = decode_image(bytes(content)).astype(np.int64)
                h, w, ch = arr.shape
                flat = arr.ravel()
                weights = np.arange(1, flat.size + 1, dtype=np.int64)
                chan = arr.reshape(-1, ch).sum(axis=0)
                rows.append({
                    "media_id": int(mid),
                    "width": w,
                    "height": h,
                    "channels": ch,
                    "px_sum": int(flat.sum()),
                    "wsum": int((flat * weights).sum()),
                    "r_sum": int(chan[0]),
                    "g_sum": int(chan[1 % ch]),
                    "b_sum": int(chan[2 % ch]),
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(proc, schema=IMAGE_FEATURE_SCHEMA)


def synth_frames(doc_id: int) -> tuple[int, np.ndarray]:
    """Deterministic RGB clip for a document id, closed-form so a
    DuckDB oracle recomputes every decoded frame feature exactly:
    fps = 4 + id%3, n = 6 + id%5 frames, w = 4 + id%3, h = 3 + id%3,
    px[t,y,x,c] = (11·id + 17t + 3x + 5y + 7c) mod 256."""
    fps = 4 + doc_id % 3
    n = 6 + doc_id % 5
    w = 4 + doc_id % 3
    h = 3 + doc_id % 3
    idx = np.arange(n * h * w * 3, dtype=np.int64)
    c = idx % 3
    x = (idx // 3) % w
    y = (idx // (3 * w)) % h
    t = idx // (3 * w * h)
    px = (doc_id * 11 + 17 * t + 3 * x + 5 * y + 7 * c) % 256
    return fps, px.reshape(n, h, w, 3).astype(np.uint8)


def synthesize_videos(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode one real uncompressed AVI per row (media_id, content
    binary) — the ingestion half of the video round-trip gate."""
    from drune_spark.operators.videoio import encode_avi

    def one(doc_id: int) -> bytes:
        fps, frames = synth_frames(doc_id)
        return encode_avi(frames, fps)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({
                "media_id": ids,
                "content": [one(int(i)) for i in ids],
            })

    return df.select(id_col).mapInPandas(
        gen, schema="media_id bigint, content binary"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling over opaque AVI binary columns — REAL codec
    (operators/videoio.py RIFF/DIB demux): decode, keep every
    ``stride = max(1, fps·every_ms/1000)``-th frame, and re-emit each
    kept frame as a standalone PNG so the output composes directly with
    ``image_features``/``extract_features``. Shuffle-free mapInPandas;
    binary in, binary out, frame rows fan wider than media rows (one
    row per sampled frame)."""
    from drune_spark.operators.imageio import encode_png
    from drune_spark.operators.videoio import decode_avi

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                fps, frames = decode_avi(bytes(content))
                stride = max(1, fps * every_ms // 1000)
                for t in range(0, frames.shape[0], stride):
                    rows.append({
                        "media_id": int(mid),
                        "frame_no": t,
                        "t_ms": t * 1000 // fps,
                        "frame": encode_png(frames[t]),
                    })
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        process,
        schema="media_id bigint, frame_no int, t_ms int, frame binary",
    )


VIDEO_FRAME_SCHEMA = (
    "media_id bigint, frame_no int, t_ms int, fps int, "
    "width int, height int, px_sum bigint, wsum bigint"
)


def video_frame_features(media: DataFrame, every_ms: int = 400) -> DataFrame:
    """REAL AVI decode (operators/videoio.py) + stride frame sampling +
    exact integer per-frame statistics; ``wsum`` = Σ px[i]·(i+1) over
    the frame's row-major pixels is order-sensitive, so one wrong byte
    anywhere in the chunk walk or DIB row math breaks the oracle hash.
    Shuffle-free mapInPandas; only 8-column frame rows leave the
    stage."""
    from drune_spark.operators.videoio import decode_avi

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                fps, frames = decode_avi(bytes(content))
                stride = max(1, fps * every_ms // 1000)
                n, h, w, _ = frames.shape
                for t in range(0, n, stride):
                    flat = frames[t].astype(np.int64).ravel()
                    rows.append({
                        "media_id": int(mid),
                        "frame_no": t,
                        "t_ms": t * 1000 // fps,
                        "fps": fps,
                        "width": w,
                        "height": h,
                        "px_sum": int(flat.sum()),
                        "wsum": int(
                            (flat * np.arange(1, flat.size + 1)).sum()
                        ),
                    })
            yield pd.DataFrame(rows)

    return media.mapInPandas(proc, schema=VIDEO_FRAME_SCHEMA)


def export_media_files(
    media: DataFrame,
    out_dir: str,
    ext: str = "png",
    fanout: int = 4,
) -> None:
    """Write each (media_id, content) row as an individual binary file
    ``out_dir/sub{media_id % fanout}/{media_id}.{ext}`` — the lake
    layout the ``binaryFile`` source reads back. Distributed via
    foreachPartition (each task writes only its rows; no driver
    collect, no shuffle); local-mode tasks share the filesystem, a
    cluster points ``out_dir`` at the object store. Fanout
    subdirectories exercise recursiveFileLookup and keep any one
    directory's listing bounded at scale."""
    import os as _os

    def _write(rows) -> None:
        for r in rows:
            sub = _os.path.join(out_dir, f"sub{int(r['media_id']) % fanout}")
            _os.makedirs(sub, exist_ok=True)
            with open(
                _os.path.join(sub, f"{int(r['media_id'])}.{ext}"), "wb"
            ) as fh:
                fh.write(bytes(r["content"]))

    media.foreachPartition(_write)


def synth_neardup_pixels(doc_id: int) -> np.ndarray:
    """Deterministic 18×16 grayscale-RGB test image whose CONTENT
    pattern depends only on ``doc_id % 6`` while a per-doc brightness
    offset ``(13·doc_id) % 40`` shifts every pixel equally — the
    closed form that makes perceptual-hash near-dup detection
    oracle-checkable: same-pattern images differ byte-wise (different
    PNGs) but must collide under a brightness-invariant dHash.
    v(g,x,y) = (37·g + 11·x + 23·y + 13·((x·y) mod 7)) mod 200 +
    offset ≤ 239, all three channels equal."""
    g = doc_id % 6
    off = (13 * doc_id) % 40
    w, h = 18, 16
    idx = np.arange(h * w, dtype=np.int64)
    x = idx % w
    y = idx // w
    v = (37 * g + 11 * x + 23 * y + 13 * ((x * y) % 7)) % 200 + off
    return np.repeat(v, 3).reshape(h, w, 3).astype(np.uint8)


def synthesize_neardup_images(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Encode one real PNG per row from synth_neardup_pixels — the
    ingestion half of the perceptual-hash near-dup gate. Arrow-batched
    mapInPandas, no shuffle."""
    from drune_spark.operators.imageio import encode_png

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({
                "media_id": ids,
                "content": [
                    encode_png(synth_neardup_pixels(int(i)))
                    for i in ids
                ],
            })

    return _ids_wide(df, id_col).mapInPandas(
        gen, schema="media_id bigint, content binary"
    )


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) after a REAL decode: inflate
    the PNG (operators/imageio.py), take the gray channel, 2×2
    block-mean down to an 8×9 grid (rows × cols — h//2 × w//2 for the
    16×18 inputs; integer floor, so a constant brightness offset
    survives the mean exactly), then bit j
    (j = 8·Y + X) = [grid[Y][X+1] > grid[Y][X]] — 64 horizontal
    gradient signs, invariant to uniform brightness and to any
    monotone per-image tone shift. Returned as two 32-bit halves
    (hash_hi = bits 32-63, hash_lo = bits 0-31) so every intermediate
    stays in signed-long range in both engines.

    Shuffle-free mapInPandas; only (media_id, hash_hi, hash_lo) rows
    leave the stage — at 100 TB the bytes never move again after this
    projection, and near-dup grouping is a groupBy on two ints."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = decode_image(bytes(content)).astype(np.int64)
                gray = arr[:, :, 0]
                h, w = gray.shape
                grid = (
                    gray.reshape(h // 2, 2, w // 2, 2)
                    .sum(axis=(1, 3)) // 4
                )
                bits = (grid[:, 1:] > grid[:, :-1]).astype(np.int64)
                flat = bits.ravel()  # j = Y*8 + X
                j = np.arange(flat.size, dtype=np.int64)
                lo = int((flat[j < 32] << j[j < 32]).sum())
                hi = int((flat[j >= 32] << (j[j >= 32] - 32)).sum())
                rows.append({
                    "media_id": int(mid),
                    "hash_hi": hi,
                    "hash_lo": lo,
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        proc, schema="media_id bigint, hash_hi bigint, hash_lo bigint"
    )


def dhash_dup_groups(hashes: DataFrame) -> DataFrame:
    """Group perceptual hashes into near-dup clusters: one groupBy on
    the two hash halves. Returns (hash_hi, hash_lo, n_dups, min_id,
    id_sum) for groups of ≥ 2 — id_sum makes the membership itself
    hash-checked, not just the group size."""
    return (
        hashes.groupBy("hash_hi", "hash_lo")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("media_id").alias("min_id"),
            F.sum("media_id").alias("id_sum"),
        )
        .filter(F.col("n_dups") >= 2)
        .orderBy("hash_hi", "hash_lo")
    )


def synth_neardup_samples(doc_id: int) -> np.ndarray:
    """Deterministic 96-frame mono PCM clip whose WAVEFORM depends only
    on ``doc_id % 5`` while a per-doc DC offset ``(11·doc_id) % 300``
    shifts every sample equally — the audio analog of
    synth_neardup_pixels: byte-different WAVs that must collide under
    a DC-invariant delta-sign fingerprint.
    s(g,i) = ((31·g + (17+7·g)·i + 23·((i·i) mod 13)) mod 1500) − 700
    + off — the slope term (17+7g) makes the delta-sign pattern differ
    per waveform (a purely additive g would cancel out of every
    delta)."""
    g = doc_id % 5
    off = (11 * doc_id) % 300
    i = np.arange(96, dtype=np.int64)
    s = (
        (31 * g + (17 + 7 * g) * i + 23 * ((i * i) % 13)) % 1500
    ) - 700 + off
    return s.reshape(96, 1).astype(np.int16)


def synthesize_neardup_audio(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Encode one real PCM-16 WAV per row from synth_neardup_samples —
    the ingestion half of the audio near-dup gate."""
    from drune_spark.operators.audioio import encode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({
                "media_id": ids,
                "content": [
                    encode_wav(synth_neardup_samples(int(i)), 8000)
                    for i in ids
                ],
            })

    return df.select(id_col).mapInPandas(
        gen, schema="media_id bigint, content binary"
    )


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Delta-sign acoustic fingerprint after a REAL decode: walk the
    RIFF chunks, decode the int16 stream (operators/audioio.py), then
    bit j = [s[j+1] > s[j]] over the first 64 sample deltas — the
    gradient-sign idea of image_dhash on the time axis, invariant to
    any DC offset and to positive gain that preserves order. Two
    32-bit halves (hash_hi = bits 32-63) keep every intermediate in
    signed-long range in both engines.

    Shuffle-free mapInPandas; only (media_id, hash_hi, hash_lo) rows
    leave the stage — grouping near-dups downstream is a 2-int
    groupBy (dhash_dup_groups), never a byte move."""
    from drune_spark.operators.audioio import decode_wav

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, samples = decode_wav(bytes(content))
                s = samples[:, 0].astype(np.int64)
                bits = (s[1:65] > s[:64]).astype(np.int64)
                j = np.arange(64, dtype=np.int64)
                lo = int((bits[j < 32] << j[j < 32]).sum())
                hi = int((bits[j >= 32] << (j[j >= 32] - 32)).sum())
                rows.append({
                    "media_id": int(mid),
                    "hash_hi": hi,
                    "hash_lo": lo,
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        proc, schema="media_id bigint, hash_hi bigint, hash_lo bigint"
    )


def synth_neardup_frames(doc_id: int) -> np.ndarray:
    """Deterministic 4-frame 18×16 grayscale-RGB clip whose pattern
    depends only on ``doc_id % 4`` while a per-doc brightness offset
    ``(7·doc_id) % 40`` shifts every pixel equally — the video analog
    of synth_neardup_pixels. The per-frame term 19·t rides inside the
    mod so frames differ; the slope term keeps patterns separable
    under gradient signs. v = (29·g + (11+5·g)·x + 23·y + 19·t +
    13·((x·y + t) mod 7)) mod 200 + off."""
    g = doc_id % 4
    off = (7 * doc_id) % 40
    n, w, h = 4, 18, 16
    idx = np.arange(n * h * w, dtype=np.int64)
    x = idx % w
    y = (idx // w) % h
    t = idx // (w * h)
    v = (
        (29 * g + (11 + 5 * g) * x + 23 * y + 19 * t
         + 13 * ((x * y + t) % 7)) % 200
    ) + off
    return np.repeat(v, 3).reshape(n, h, w, 3).astype(np.uint8)


def synthesize_neardup_videos(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Encode one real uncompressed AVI per row from
    synth_neardup_frames — the ingestion half of the video near-dup
    gate."""
    from drune_spark.operators.videoio import encode_avi

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({
                "media_id": ids,
                "content": [
                    encode_avi(synth_neardup_frames(int(i)), 4)
                    for i in ids
                ],
            })

    return _ids_wide(df, id_col).mapInPandas(
        gen, schema="media_id bigint, content binary"
    )


def video_fingerprint(media: DataFrame) -> DataFrame:
    """Temporal perceptual hash after a REAL demux+decode: every frame
    gets the image_dhash treatment (gray channel, 2×2 block mean to
    an 8×9 rows × cols grid, 64 horizontal gradient signs —
    brightness-invariant), and the
    per-frame 32-bit halves fold with XOR across frames — order-
    insensitively mergeable, so a distributed decode can fingerprint
    frame shards independently and combine. Shuffle-free mapInPandas;
    only (media_id, hash_hi, hash_lo) leaves the stage."""
    from drune_spark.operators.videoio import decode_avi

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, frames = decode_avi(bytes(content))
                hi = lo = 0
                for f in frames.astype(np.int64):
                    gray = f[:, :, 0]
                    h, w = gray.shape
                    grid = (
                        gray.reshape(h // 2, 2, w // 2, 2)
                        .sum(axis=(1, 3)) // 4
                    )
                    bits = (grid[:, 1:] > grid[:, :-1]).astype(
                        np.int64
                    ).ravel()
                    j = np.arange(bits.size, dtype=np.int64)
                    lo ^= int((bits[j < 32] << j[j < 32]).sum())
                    hi ^= int(
                        (bits[j >= 32] << (j[j >= 32] - 32)).sum()
                    )
                rows.append({
                    "media_id": int(mid),
                    "hash_hi": hi,
                    "hash_lo": lo,
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        proc, schema="media_id bigint, hash_hi bigint, hash_lo bigint"
    )


def image_resize_features(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL decode + integer box-filter resize (the mandate's named
    resize op): inflate the PNG/BMP, average each factor×factor block
    with floor division (the exact arithmetic a DuckDB oracle can
    replay from the pixel formula), and emit the resized image's
    integer checksum features — ``wsum`` = Σ px[i]·(i+1) over the
    row-major resized gray plane is order-sensitive, so a wrong block
    boundary, a transposed axis or an off-by-one in the mean breaks
    the hash. In a production pipeline the resized planes would flow
    to the next Arrow stage instead of reducing to features; the
    decode→resize plumbing is identical.

    Shuffle-free mapInPandas; images whose dimensions aren't
    divisible by ``factor`` crop the ragged edge first (the standard
    box-filter convention)."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = decode_image(bytes(content)).astype(np.int64)
                gray = arr[:, :, 0]
                h, w = gray.shape
                oh, ow = h // factor, w // factor
                crop = gray[: oh * factor, : ow * factor]
                grid = (
                    crop.reshape(oh, factor, ow, factor)
                    .sum(axis=(1, 3)) // (factor * factor)
                )
                flat = grid.ravel()
                wts = np.arange(1, flat.size + 1, dtype=np.int64)
                rows.append({
                    "media_id": int(mid),
                    "out_w": ow,
                    "out_h": oh,
                    "px_sum": int(flat.sum()),
                    "wsum": int((flat * wts).sum()),
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        proc,
        schema="media_id bigint, out_w int, out_h int, "
               "px_sum bigint, wsum bigint",
    )


def corrupt_media_subset(
    media: DataFrame,
    mod: int = 7,
    truncate_rem: int = 3,
    clobber_rem: int = 5,
) -> DataFrame:
    """Deterministic fault injection for the quarantine gate: rows with
    ``media_id % mod == truncate_rem`` keep only their first 20 bytes
    (mid-stream truncation — the classic upload failure), rows with
    ``media_id % mod == clobber_rem`` get their magic byte flipped
    (wrong-format/bit-rot); everything else passes through. Closed
    form by id arithmetic, so the oracle knows exactly which files a
    correct decoder must reject."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                r = int(mid) % mod
                if r == truncate_rem:
                    b = b[:20]
                elif r == clobber_rem:
                    b = bytes([b[0] ^ 0xFF]) + b[1:]
                out.append(b)
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "content": out,
            })

    return media.mapInPandas(
        gen, schema="media_id bigint, content binary"
    )


def media_quarantine(media: DataFrame) -> DataFrame:
    """Corrupt-file quarantine — the decode-stage twin of the
    streaming dead-letter route: every binary is REALLY decoded
    (operators/imageio.py); files the codec rejects land in the
    quarantine with route='quarantine' instead of poisoning the batch
    (one bad upload must never fail a 100 TB decode stage), clean
    files emit route='ok' plus their exact pixel sum — proof the
    decode ran, not just a try/except around a header sniff.

    Arrow-batched mapInPandas, per-row isolation inside the batch
    loop; only (id, route, reason, px_sum) rows leave the stage.
    """
    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    arr = decode_image(bytes(content))
                    rows.append({
                        "media_id": int(mid),
                        "route": "ok",
                        "reason": "",
                        "px_sum": int(
                            arr.astype(np.int64).sum()
                        ),
                    })
                except Exception:  # noqa: BLE001 — quarantine, not fail
                    rows.append({
                        "media_id": int(mid),
                        "route": "quarantine",
                        "reason": "decode_error",
                        "px_sum": 0,
                    })
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        proc,
        schema="media_id bigint, route string, reason string, "
               "px_sum bigint",
    )


AUDIO_RESAMPLE_SCHEMA = (
    "media_id bigint, rate_in int, rate_out int, n_in int, n_out int, "
    "out_wsum bigint"
)


def audio_resample(media: DataFrame, factor: int = 2) -> DataFrame:
    """Integer rational downsampling (the 16 kHz→8 kHz pass every
    speech-data pipeline runs before feature extraction): REAL WAV
    decode, then each output sample is the box-filter mean of
    ``factor`` consecutive input time steps per channel, computed as
    ``(Σ (x+2048)) div factor − 2048`` — the domain shift keeps the
    division on NONNEGATIVE operands so floor == trunc and the DuckDB
    ``//`` replay is value-exact (the r5 trunc-vs-floor rule). A
    trailing partial group is dropped (n_out = n_in div factor), as a
    real decimator would.

    ``out_wsum`` = Σ y[j]·(j+1) over the interleaved output stream —
    order-sensitive, so any mis-grouped or mis-averaged sample breaks
    the oracle hash. Shuffle-free mapInPandas.

    Returns (media_id, rate_in, rate_out, n_in, n_out, out_wsum).
    """
    from drune_spark.operators.audioio import decode_wav

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                rate, arr = decode_wav(bytes(content))
                n, ch = arr.shape
                n_out = n // factor
                x = arr[: n_out * factor].astype(np.int64) + 2048
                y = (
                    x.reshape(n_out, factor, ch).sum(axis=1) // factor
                ) - 2048
                flat = y.ravel()
                rows.append({
                    "media_id": int(mid),
                    "rate_in": rate,
                    "rate_out": rate // factor,
                    "n_in": n,
                    "n_out": n_out,
                    "out_wsum": int(
                        (flat * np.arange(1, flat.size + 1)).sum()
                    ),
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(proc, schema=AUDIO_RESAMPLE_SCHEMA)


# Canonical resolution ladder for aspect-ratio bucketed batching: the
# SDXL-style bucket list — one square plus landscape/portrait pairs at
# progressively wider aspect ratios, all ≈ 512² pixels so every batch
# has a near-constant token/compute budget.
ASPECT_BUCKETS: list[tuple[int, int, int]] = [
    (0, 512, 512),
    (1, 640, 448),
    (2, 448, 640),
    (3, 768, 384),
    (4, 384, 768),
    (5, 896, 320),
    (6, 320, 896),
]


def aspect_ratio_buckets(
    meta: DataFrame,
    id_col: str = "media_id",
    w_col: str = "width",
    h_col: str = "height",
    batch_size: int = 8,
    buckets: list[tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Aspect-ratio bucketed batch assembly for image training (the
    NovelAI/SDXL data-loading pattern): images may only share a batch
    with images of the SAME target resolution, so each image is
    assigned to the ladder bucket whose aspect ratio it is closest to,
    then packed into fixed-size batches within its bucket. Resizing to
    a shared per-batch resolution instead of one global square crop is
    what preserves composition at training time.

    All integer: closeness is the cross-multiplied ratio distance
    ``|w·bh − h·bw|`` (no float division), ties → lower bucket index
    via the integer-encoded argmin ``min(dist·16 + idx)``; batch ids
    are ``(row_number − 1) div batch_size`` over (bucket, id) — one
    small literal explode + one window partitioned by bucket, no
    global sort. At 100 TB the window key would widen to
    (bucket, shard) exactly like the dataloader's shards.

    Returns per (bucket_w, bucket_h, batch_id): n_imgs, sum_src_pixels
    and n_upscaled (images whose source area is below the bucket
    area — they would upscale, the quality-loss census a curation
    pass reviews).

    No counterpart in /root/reference; driver-mandated multimodal
    training-data extension.
    """
    bks = buckets or ASPECT_BUCKETS
    # The %16 argmin decode and the coalesce dim lookup depend on the
    # DECLARED indices, not the list length: indices must be unique,
    # nonnegative and < 16 or decode silently mis-assigns.
    idxs = [i for i, _, _ in bks]
    if len(set(idxs)) != len(idxs) or any(
        i < 0 or i >= 16 for i in idxs
    ):
        raise ValueError(
            "bucket indices must be unique and in [0, 16): "
            f"{idxs}"
        )
    # Output is keyed by (bucket_w, bucket_h, batch_id), not bidx:
    # two indices sharing one (bw, bh) would silently merge their
    # batches in the final groupBy.
    dims = [(bw, bh) for _, bw, bh in bks]
    if len(set(dims)) != len(dims):
        raise ValueError(
            f"bucket (width, height) pairs must be unique: {dims}"
        )
    cand = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("bidx"),
                F.lit(bw).cast("long").alias("bw"),
                F.lit(bh).cast("long").alias("bh"),
            )
            for i, bw, bh in bks
        ])
    )
    base = meta.select(
        F.col(id_col).alias("id"),
        F.col(w_col).cast("long").alias("w"),
        F.col(h_col).cast("long").alias("h"),
    ).select("id", "w", "h", cand.alias("b"))
    best = (
        base.select(
            "id", "w", "h",
            (
                F.abs(
                    F.col("w") * F.col("b.bh") - F.col("h") * F.col("b.bw")
                )
                * F.lit(16)
                + F.col("b.bidx")
            ).alias("enc"),
        )
        .groupBy("id", "w", "h")
        .agg(F.min("enc").alias("enc"))
        .select("id", "w", "h", (F.col("enc") % 16).alias("bidx"))
    )
    bw_expr = F.coalesce(*[
        F.when(F.col("bidx") == i, F.lit(bw).cast("long"))
        for i, bw, _ in bks
    ])
    bh_expr = F.coalesce(*[
        F.when(F.col("bidx") == i, F.lit(bh).cast("long"))
        for i, _, bh in bks
    ])
    batched = best.select(
        "bidx", "w", "h",
        bw_expr.alias("bucket_w"),
        bh_expr.alias("bucket_h"),
        F.expr(f"(row_number() OVER (PARTITION BY bidx ORDER BY id) - 1)"
               f" div {int(batch_size)}").alias("batch_id"),
    )
    return batched.groupBy("bucket_w", "bucket_h", "batch_id").agg(
        F.count(F.lit(1)).alias("n_imgs"),
        F.sum(F.expr("w * h")).cast("long").alias("sum_src_pixels"),
        F.count_if(
            F.col("w") * F.col("h") < F.col("bucket_w") * F.col("bucket_h")
        ).alias("n_upscaled"),
    )


def synth_jpeg_blocks(doc_id: int) -> np.ndarray:
    """Deterministic grayscale test image for the JPEG gate, built from
    CONSTANT 8×8 blocks with EVEN values so the flat-16 quantization
    roundtrip is bit-exact (see jpegio.py module docstring):
    w = 16 + 4·(id%3), h = 8 + 4·(id%2) (non-multiples of 8 included),
    block value v(bx, by) = 2·((7·id + 5·bx + 3·by) mod 64) + 64,
    pixel(y, x) = v(x div 8, y div 8). Closed-form → the DuckDB oracle
    recomputes every decoded feature from this formula alone."""
    w = 16 + 4 * (doc_id % 3)
    h = 8 + 4 * (doc_id % 2)
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    v = 2 * ((7 * doc_id + 5 * (x // 8) + 3 * (y // 8)) % 64) + 64
    return v.astype(np.uint8)[..., None]


def synthesize_jpegs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode one REAL baseline JPEG per row (media_id, content binary)
    — full DCT → quantize → zigzag → Huffman pipeline per image
    (operators/jpegio.py), flat-16 quantization so the constant-block
    pixels roundtrip exactly. Arrow-batched, no shuffle."""
    import numpy as _np

    from drune_spark.operators.jpegio import encode_jpeg

    flat16 = _np.full((8, 8), 16, dtype=_np.int64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({
                "media_id": ids,
                "content": [
                    encode_jpeg(synth_jpeg_blocks(int(i)), quant_luma=flat16)
                    for i in ids
                ],
            })

    return _ids_wide(df, id_col).mapInPandas(
        gen, schema="media_id bigint, content binary"
    )
