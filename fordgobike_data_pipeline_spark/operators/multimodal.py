"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side machinery — schema, partition sizing, Arrow
batch shape, UDF signatures — is real and tested; the actual media
decode is STUBBED (PIL/ffmpeg are not in this container): each decode
function first tries the real library and otherwise uses a clearly
marked deterministic fake so the pipeline stays testable end-to-end.

Scale notes: media rows are orders of magnitude wider than text —
``repartition_for_media`` sizes partitions by *bytes*, not rows, so a
single Arrow batch stays within executor memory; decode runs in
mapInPandas (Arrow-batched, no per-row Python overhead).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("sha256", T.StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def attach_binary(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", mime: str = "application/octet-stream"
) -> DataFrame:
    """Build a media table from any source column: binary payload +
    typed metadata (mime, size, content hash). With real media the
    payload comes from the storage layer; here the utf-8 bytes stand in
    so every downstream shape is exercised."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def repartition_for_media(df: DataFrame, target_bytes_per_partition: int = 128 << 20) -> DataFrame:
    """Partition by payload volume: estimates total bytes from the
    metadata column (cheap aggregate over the stats, not the payloads)
    and repartitions so each Arrow batch holds ~target bytes."""
    total = df.agg(F.sum("meta.n_bytes")).first()[0] or 0
    n = max(1, int(total // target_bytes_per_partition) + 1)
    return df.repartition(n)


def extract_image_features(media: DataFrame, decoder: str = "auto") -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    ``decoder='auto'`` tries PIL; without it, a deterministic fake
    derives pseudo-features from the payload bytes (marked
    ``decoder='stub'``) so schema, batching and determinism are
    testable. ``decoder='stub'`` pins the fake regardless of
    environment — the seeded-oracle-twin mode, where the stub's
    integer byte arithmetic is reproduced in SQL. Swap in the real
    decoder by installing PIL — no plan change.
    """
    import pandas as pd

    if decoder not in ("auto", "stub"):
        raise ValueError(f"decoder must be 'auto' or 'stub', got {decoder!r}")
    forced = decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if forced == "stub":
            decoder = "stub"
        else:
            try:
                from PIL import Image  # noqa: F401

                decoder = "pil"
            except ImportError:
                decoder = "stub"
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                if decoder == "pil":
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(data))
                    w, h = img.size
                    luma = float(sum(img.convert("L").getdata())) / (w * h)
                else:
                    # deterministic fake: shape from payload length,
                    # luma from byte content
                    w = 16 + len(data) % 64
                    h = 16 + (len(data) // 64) % 64
                    luma = (sum(data[:256]) / max(1, min(len(data), 256))) if data else 0.0
                rows.append([int(mid), int(w), int(h), float(luma), decoder])
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_luma", "decoder"]
            )

    return media.select("media_id", "content").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, decoder: str = "auto"
) -> DataFrame:
    """Batch image resize via Arrow-batched mapInPandas — the standard
    normalization step before vision-model featurization.

    ``decoder='auto'`` tries PIL; without it a deterministic fake
    emits a payload whose bytes are a strided resample of the input
    (marked ``decoder='stub'``), so output schema, batch shape and
    payload determinism are all testable; ``decoder='stub'`` pins the
    fake (the seeded-oracle-twin mode). Output rows carry the
    requested (width, height) and the re-encoded payload; partition
    sizing is the caller's job via ``repartition_for_media`` (resized
    output is usually smaller, never larger, than the input batch)."""
    import pandas as pd

    if width <= 0 or height <= 0:
        raise ValueError(f"target size must be positive, got {width}x{height}")
    if decoder not in ("auto", "stub"):
        raise ValueError(f"decoder must be 'auto' or 'stub', got {decoder!r}")
    n_out = width * height
    forced = decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if forced == "stub":
            decoder = "stub"
        else:
            try:
                from PIL import Image  # noqa: F401

                decoder = "pil"
            except ImportError:
                decoder = "stub"
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                if decoder == "pil":
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(data)).resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out = buf.getvalue()
                else:
                    # deterministic fake: strided byte resample to the
                    # target pixel count (empty input → zero bytes)
                    if data:
                        step = max(1, len(data) // n_out)
                        out = data[::step][:n_out]
                    else:
                        out = b""
                rows.append([int(mid), width, height, out, decoder])
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "content", "decoder"]
            )

    return media.select("media_id", "content").mapInPandas(run, schema=RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms_level", T.DoubleType()),
        T.StructField("peak_level", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def extract_audio_features(media: DataFrame, sample_rate: int = 16_000) -> DataFrame:
    """Audio decode + loudness features via Arrow-batched mapInPandas —
    the audio leg of the multimodal family (same plumbing contract as
    :func:`extract_image_features`).

    Tries the stdlib ``wave`` reader for RIFF/WAV payloads; any other
    payload falls back to a deterministic fake that treats the bytes as
    signed 16-bit PCM at ``sample_rate`` (marked ``decoder='stub'``),
    so sample count, duration, RMS and peak are reproducible functions
    of the payload and the schema/batch shape is exercised end-to-end.
    Feature math is one numpy pass per Arrow batch — no per-row Python
    beyond the decode attempt."""
    import numpy as np
    import pandas as pd

    if sample_rate <= 0:
        raise ValueError(f"sample_rate must be positive, got {sample_rate}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                pcm, rate, decoder = None, sample_rate, "stub"
                if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                    try:
                        import io
                        import wave

                        with wave.open(io.BytesIO(data)) as w:
                            rate = w.getframerate()
                            raw = w.readframes(w.getnframes())
                        pcm = np.frombuffer(raw, dtype="<i2")
                        decoder = "wave"
                    except Exception:
                        pcm = None
                if pcm is None:
                    # deterministic fake: interpret payload as 16-bit PCM
                    pcm = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2")
                n = int(pcm.size)
                x = pcm.astype(np.float64) / 32768.0
                rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                peak = float(np.max(np.abs(x))) if n else 0.0
                rows.append(
                    [int(mid), n, float(n) / rate, round(rms, 6), round(peak, 6), decoder]
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "duration_sec",
                    "rms_level", "peak_level", "decoder",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling — the *plumbing* (one row per sampled
    offset, bounded fan-out) with a stubbed frame grab: offsets are
    computed relationally; the frame payload slice stands in for a
    decoded frame."""
    n_frames = F.least(
        (F.col("meta.n_bytes") / every_n_bytes).cast("int") + 1, F.lit(max_frames)
    )
    exploded = media.select(
        "media_id", F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("pos", "idx")
    )
    return exploded.select(
        "media_id",
        F.col("pos").cast("int").alias("frame_idx"),
        (F.col("idx") * every_n_bytes).cast("long").alias("byte_offset"),
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def phash_images(media: DataFrame, grid: int = 32, decoder: str = "auto") -> DataFrame:
    """Perceptual hash (pHash) per image: decode → 32×32 grayscale →
    2D DCT-II → top-left 8×8 low-frequency block (DC dropped) →
    median-threshold → 64-bit hash. Near-duplicate images differ in a
    few bits; re-encoded/resized copies usually hash within hamming
    ≤ 6 — the image twin of SimHash for text.

    Decode follows the module contract: PIL when present, else the
    deterministic fake (payload bytes tiled into the pixel grid,
    ``decoder='stub'``) so hashing, banding and the join shape are
    testable without media libs. DCT is a numpy matmul (no scipy),
    Arrow-batched in mapInPandas."""
    import numpy as np
    import pandas as pd

    if decoder not in ("auto", "stub"):
        raise ValueError(f"decoder must be 'auto' or 'stub', got {decoder!r}")
    forced = decoder
    n = grid
    # DCT-II basis matrix, orthonormal
    k = np.arange(n)
    dct_m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    dct_m[0, :] = np.sqrt(1.0 / n)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if forced == "stub":
            decoder = "stub"
        else:
            try:
                from PIL import Image  # noqa: F401

                decoder = "pil"
            except ImportError:
                decoder = "stub"
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                if decoder == "pil":
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(data)).convert("L").resize((n, n))
                    px = np.asarray(img, dtype=np.float64)
                else:
                    # deterministic fake mimicking decode + downscale:
                    # AVERAGE-POOL the payload into the grid (≥4 bytes
                    # per cell), so a one-byte change perturbs one cell
                    # fractionally — the robustness real pHash gets
                    # from resize smoothing
                    buf = np.frombuffer(data, dtype=np.uint8)
                    if buf.size == 0:
                        buf = np.zeros(1, dtype=np.uint8)
                    cells = n * n
                    reps = int(np.ceil(4 * cells / buf.size))
                    pooled = np.tile(buf, max(reps, 1)).astype(np.float64)
                    per = pooled.size // cells
                    px = pooled[: per * cells].reshape(cells, per).mean(axis=1).reshape(n, n)
                freq = dct_m @ px @ dct_m.T
                block = freq[:8, :8].flatten()[1:]  # drop DC
                med = float(np.median(block))
                bits = 0
                for i, v in enumerate(block):
                    if v > med:
                        bits |= 1 << i
                # 63 content bits; store as signed 64-bit
                rows.append([int(mid), int(np.int64(bits)), decoder])
            yield pd.DataFrame(rows, columns=["media_id", "phash", "decoder"])

    return media.select("media_id", "content").mapInPandas(run, schema=PHASH_SCHEMA)


def phash_near_pairs(hashes: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate image pairs from pHashes WITHOUT the quadratic
    cross join: the 64-bit hash splits into four 16-bit bands,
    candidates are the band-equality buckets, then one exact popcount
    verify. Pigeonhole GUARANTEES a shared band only for hamming ≤ 3
    (each flipped bit dirties at most one band; 4+ flips can spread
    across all 4 bands); pairs at hamming 4–6 are found with high
    probability because perceptual-hash differences cluster in the
    low-frequency bit positions rather than spreading uniformly — the
    standard LSH-band recall trade (guaranteed-≤3 would need 7 bands
    of 9 bits, whose 512-value band space collapses into hot buckets
    at corpus scale). Precision is exact: every emitted pair passed
    the popcount. Identical relational shape to dedup.simhash_pairs —
    dedup's band-join machinery applied to the image modality."""
    bands = hashes.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("phash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("media_id", "phash", F.col("b.band_idx"), F.col("b.band_val"))
    a = bands.select(
        F.col("media_id").alias("id_a"),
        F.col("phash").alias("h_a"),
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("phash").alias("h_b"),
        "band_idx",
        "band_val",
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
