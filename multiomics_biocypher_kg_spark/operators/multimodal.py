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
