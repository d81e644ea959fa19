"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB:
- payloads live in a ``binary`` column (or object-store pointers for
  >~1 MB blobs), metadata in sibling typed columns
  (kind/width/height/sample_rate/duration...),
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` batch iterators: one Arrow batch in, one out, the
  decoder library initialized once per partition — never per row,
- partitioning by content hash keeps batches size-uniform even when
  a few assets are huge (size skew lives in bytes, not rows).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
``decode_features`` dispatches to a clearly-marked stub: a
deterministic byte-statistics "decoder" that keeps the Spark-side
contract (schema, batching, partitioning) real and testable, and a
``NotImplementedError`` branch where the real codec would slot in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, kind string, n_bytes int, byte_mean double, byte_mode int"
)

KINDS = ["image", "audio", "video"]


def attach_payloads(docs: DataFrame) -> DataFrame:
    """Synthesize opaque binary payloads + typed metadata from the
    documents table (deterministic; FIXTURES A1-style).

    kind cycles by doc_id; payload = utf-8 bytes of the text (an
    opaque stand-in — downstream code treats it as codec input).
    """
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
    )


def _stub_decode(kind: str, payload: bytes) -> tuple[float, int]:
    """Deterministic fake decoder: byte mean + modal byte value.

    A real deployment replaces this body per kind:
        image -> PIL.Image.open(io.BytesIO(payload)) ... resize/embed
        audio -> librosa.load(...) ... mel features
        video -> ffmpeg frame sample ... per-frame image path
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    if not payload:
        return (0.0, 0)
    counts: dict[int, int] = {}
    total = 0
    for b in payload:
        counts[b] = counts.get(b, 0) + 1
        total += b
    mode = min(k for k, v in counts.items() if v == max(counts.values()))
    return (total / len(payload), mode)


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas batch decode: (doc_id, kind, payload, n_bytes) ->
    FEATURE_SCHEMA rows. Batch-at-a-time so a real decoder amortizes
    model/codec init across the Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition decoder init would go here (once, not per row)
        for pdf in batches:
            means, modes = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                m, mo = _stub_decode(kind, bytes(payload))
                means.append(m)
                modes.append(mo)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "byte_mean": means,
                    "byte_mode": modes,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codec path: uncompressed container formats decodable with the
# stdlib alone (no PIL/ffmpeg needed) — binary P6 PPM for images and
# RIFF/WAV PCM-16 for audio. The synthesis writes genuine files of
# those formats; the decoder parses them from the container headers
# WITHOUT assuming how they were produced (it handles PPM comments,
# arbitrary dimensions/maxval, and any PCM-16 mono WAV). This is the
# "real decode" end of the declared codec slot: the stubbed
# byte-statistics path above keeps the plumbing gated where codecs
# are absent; this path proves the same Arrow batch contract carries
# an actual format parse. Reference analog: the real PDF text decode
# in pdf_publication_extraction.py:154-211 (binary container in,
# typed features out).
# ---------------------------------------------------------------------------

PPM_W = 8
PPM_H = 8
WAV_RATE = 8000
WAV_SAMPLES = 256

REAL_MEDIA_SCHEMA = "doc_id long, kind string, payload binary"
REAL_FEATURE_SCHEMA = (
    "doc_id long, kind string, width int, height int, sample_rate int, "
    "n_units long, mean_value double"
)


def attach_real_payloads(docs: DataFrame) -> DataFrame:
    """Synthesize REAL media files deterministically from the text
    column: even doc_ids get a binary P6 PPM (8x8 RGB, pixel bytes =
    utf-8 text bytes cycled), odd doc_ids a PCM-16 mono WAV (256
    samples, sample i = (byte_i - 128) * 256 with text bytes cycled).
    Both are valid files any external tool can open."""
    import io
    import struct
    import wave

    n_px = PPM_W * PPM_H * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                if doc_id % 2 == 0:
                    px = bytes(data[i % len(data)] for i in range(n_px))
                    header = f"P6\n{PPM_W} {PPM_H}\n255\n".encode("ascii")
                    kinds.append("image")
                    payloads.append(header + px)
                else:
                    samples = [
                        (data[i % len(data)] - 128) * 256
                        for i in range(WAV_SAMPLES)
                    ]
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as w:
                        w.setnchannels(1)
                        w.setsampwidth(2)
                        w.setframerate(WAV_RATE)
                        w.writeframes(
                            struct.pack(f"<{WAV_SAMPLES}h", *samples)
                        )
                    kinds.append("audio")
                    payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(list(pdf["doc_id"]), dtype="int64"),
                    "kind": pd.Series(kinds, dtype=object),
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(run, REAL_MEDIA_SCHEMA)


def _parse_ppm(b: bytes) -> tuple[int, int, bytes]:
    """Parse a binary P6 PPM: magic, '#' comments, whitespace-split
    (width, height, maxval) tokens, then the pixel plane. Returns
    (width, height, pixel_bytes)."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(b):
            raise ValueError("truncated PPM header")
        c = b[pos : pos + 1]
        if c == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(b[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    width, height, maxval = tokens
    if maxval >= 256:
        raise NotImplementedError("16-bit PPM planes not supported")
    px = b[pos : pos + width * height * 3]
    if len(px) != width * height * 3:
        raise ValueError("truncated PPM pixel plane")
    return width, height, px


def decode_real_features(media: DataFrame) -> DataFrame:
    """REAL mapInPandas decode: dispatch on the container magic bytes
    (P6 -> PPM pixel plane; RIFF -> stdlib ``wave`` PCM-16 frames) and
    emit typed features — (width, height, n_pixel_bytes, mean pixel
    value) for images, (sample_rate, n_samples, mean |amplitude|) for
    audio. ``mean_value`` is UNROUNDED — consumers round engine-side
    so both engines use the same HALF_UP rule. Unknown containers
    raise NotImplementedError (the declared slot for codecs this
    sandbox lacks)."""
    import io
    import struct
    import wave

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # real deployments init heavier codecs HERE, once per partition
        for pdf in batches:
            ids, kinds, ws, hs, rates, units, means = ([] for _ in range(7))
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] == b"P6":
                    width, height, px = _parse_ppm(b)
                    ids.append(doc_id)
                    kinds.append("image")
                    ws.append(width)
                    hs.append(height)
                    rates.append(None)
                    units.append(len(px))
                    means.append(sum(px) / len(px))
                elif b[:4] == b"RIFF":
                    with wave.open(io.BytesIO(b), "rb") as w:
                        if w.getsampwidth() != 2 or w.getnchannels() != 1:
                            raise NotImplementedError(
                                "only PCM-16 mono WAV supported"
                            )
                        n = w.getnframes()
                        rate = w.getframerate()
                        samples = struct.unpack(f"<{n}h", w.readframes(n))
                    ids.append(doc_id)
                    kinds.append("audio")
                    ws.append(None)
                    hs.append(None)
                    rates.append(rate)
                    units.append(n)
                    means.append(sum(abs(s) for s in samples) / n)
                else:
                    raise NotImplementedError(
                        f"no decoder for container magic {b[:4]!r}"
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "kind": pd.Series(kinds, dtype=object),
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "sample_rate": pd.Series(rates, dtype="Int32"),
                    "n_units": pd.Series(units, dtype="int64"),
                    "mean_value": pd.Series(means, dtype="float64"),
                }
            )

    return media.mapInPandas(run, REAL_FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id long, kind string, width int, height int, payload binary"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, n_bytes int"


def resize_images(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """mapInPandas image 'resize': non-image rows pass through
    untouched metadata-wise; image payloads map through the stub
    resampler (deterministic stride subsample to width*height bytes —
    a real deployment swaps in PIL thumbnailing with the identical
    batch contract). Output rows == input rows."""

    n_out = width * height

    def _stub_resize(payload: bytes) -> bytes:
        if not payload:
            return b""
        if len(payload) <= n_out:
            return payload
        step = len(payload) / n_out
        return bytes(payload[int(i * step)] for i in range(n_out))

    def run(batches):
        # real codec init (PIL) would happen HERE, once per partition
        for pdf in batches:
            out, widths, heights = [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if kind == "image":
                    out.append(_stub_resize(bytes(payload)))
                    widths.append(width)
                    heights.append(height)
                else:
                    # passthrough rows keep NULL dimensions — stamping
                    # the target size on an untouched payload would lie
                    # to consumers sizing buffers from width*height
                    out.append(bytes(payload))
                    widths.append(None)
                    heights.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(list(pdf["doc_id"]), dtype="int64"),
                    "kind": pd.Series(list(pdf["kind"]), dtype=object),
                    "width": pd.Series(widths, dtype="Int32"),
                    "height": pd.Series(heights, dtype="Int32"),
                    # dtype=object keeps Arrow's binary conversion valid
                    # even for an empty batch (a bare list would infer
                    # float64 and fail the large_binary cast)
                    "payload": pd.Series(out, dtype=object),
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """mapInPandas video frame sampling: each video payload yields
    ``n_frames`` equal byte slices as one row per 'frame' (the real
    ffmpeg keyframe extractor slots into the same one-batch-in,
    many-rows-out contract); non-video rows produce nothing.
    Deterministic boundaries: frame i = payload[i*L//n : (i+1)*L//n].
    """

    def run(batches):
        for pdf in batches:
            ids, idxs, frames, sizes = [], [], [], []
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                b = bytes(payload)
                ln = len(b)
                for i in range(n_frames):
                    fr = b[(i * ln) // n_frames : ((i + 1) * ln) // n_frames]
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(fr)
                    sizes.append(len(fr))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


RESIZE_REAL_SCHEMA = (
    "doc_id long, in_width int, in_height int, out_width int, "
    "out_height int, n_units long, mean_value double, mean_r double, "
    "mean_g double, mean_b double, payload binary"
)


def resize_real_images(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL nearest-neighbor image downscale through the Arrow
    contract: parse the P6 PPM payload, keep every ``factor``-th
    pixel in both axes (the top-left representative — the standard
    nearest-neighbor convention for integer factors), re-emit a
    VALID resized P6 payload plus per-channel statistics of the
    resized plane. Non-PPM payloads raise NotImplementedError (the
    declared codec slot). The companion registry oracle recomputes
    the kept-pixel statistics from the source text via the pixel
    index arithmetic, so a stride/offset bug in the slicing is a
    hash mismatch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # heavier codecs would init here, once per partition
        for pdf in batches:
            out = {
                "doc_id": [], "in_width": [], "in_height": [],
                "out_width": [], "out_height": [], "n_units": [],
                "mean_value": [], "mean_r": [], "mean_g": [],
                "mean_b": [], "payload": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] != b"P6":
                    raise NotImplementedError(
                        f"no resize for container magic {b[:4]!r}"
                    )
                w, h, px = _parse_ppm(b)
                ow, oh = w // factor, h // factor
                kept = bytearray()
                for r in range(oh):
                    for c in range(ow):
                        base = ((r * factor) * w + (c * factor)) * 3
                        kept += px[base : base + 3]
                header = f"P6\n{ow} {oh}\n255\n".encode("ascii")
                chans = [kept[i::3] for i in range(3)]
                out["doc_id"].append(doc_id)
                out["in_width"].append(w)
                out["in_height"].append(h)
                out["out_width"].append(ow)
                out["out_height"].append(oh)
                out["n_units"].append(len(kept))
                out["mean_value"].append(sum(kept) / len(kept))
                out["mean_r"].append(sum(chans[0]) / len(chans[0]))
                out["mean_g"].append(sum(chans[1]) / len(chans[1]))
                out["mean_b"].append(sum(chans[2]) / len(chans[2]))
                out["payload"].append(bytes(header + kept))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "in_width": pd.Series(out["in_width"], dtype="int32"),
                    "in_height": pd.Series(out["in_height"], dtype="int32"),
                    "out_width": pd.Series(out["out_width"], dtype="int32"),
                    "out_height": pd.Series(out["out_height"], dtype="int32"),
                    "n_units": pd.Series(out["n_units"], dtype="int64"),
                    "mean_value": pd.Series(out["mean_value"], dtype="float64"),
                    "mean_r": pd.Series(out["mean_r"], dtype="float64"),
                    "mean_g": pd.Series(out["mean_g"], dtype="float64"),
                    "mean_b": pd.Series(out["mean_b"], dtype="float64"),
                    "payload": pd.Series(out["payload"], dtype=object),
                }
            )

    return media.mapInPandas(run, RESIZE_REAL_SCHEMA)
