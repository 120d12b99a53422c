"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Model (SURVEY §1.2 raster-as-rows + BinaryType WKB convention, generalized):
a media row is (id, kind, payload binary, meta struct<width,height,
duration_ms,codec>). Decode / feature-extract / resize / frame-sample run as
Arrow-batched mapInPandas kernels; the image/audio codec libraries are NOT
in this container, so the codec step is STUBBED:

- `decode_stub_deterministic`: a clearly-marked deterministic FAKE decode
  (payload bytes -> stable per-row feature stats via hashing) that keeps
  the Spark-side plumbing (schema, batch shape, partition behavior) real
  and testable;
- `decode_real`: raises NotImplementedError with the dependency note.

At scale the payloads dominate bytes: keep them in their own parquet column
chunk (they are), never project them unless the kernel needs them (column
pruning does the rest), and size maxRecordsPerBatch so a batch of payloads
fits executor memory.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_SCHEMA = (
    "id long, kind string, n_bytes long, "
    "feat array<double>, ok boolean"
)


def decode_real(payload: bytes, kind: str):
    """Real media decode — requires PIL/ffmpeg, not in this container."""
    raise NotImplementedError(
        "media decode requires an image/audio codec library (PIL/ffmpeg); "
        "not available in this environment — use decode_stub_deterministic"
    )


def _stub_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'embedding' from payload bytes (md5-expanded)."""
    h = hashlib.md5(payload).digest()
    raw = np.frombuffer((h * ((dim * 8) // len(h) + 1))[: dim * 8], dtype=np.uint64)
    return (raw.astype(np.float64) / 2.0 ** 64)[:dim]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (stubbed codec).

    The Spark-side contract is real: Arrow batches of binary in, fixed-dim
    double arrays out, one output row per input row, partition-parallel.
    """
    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches):
        for pdf in batches:
            feats = [
                _stub_features(p, dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feat": feats,
                    "ok": [p is not None for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize kernel over image rows (codec STUBBED — deterministic fake).

    Real shape of the op: decode payload -> resample pixel grid -> encode;
    the resample itself is the warp kernel family the engine implements on
    cell tables (gcore/overview.cpp kernels). Here the stub re-derives a
    payload of the target 'size' deterministically from the source bytes
    (md5-keyed) and rewrites meta.width/height, keeping the Arrow batch
    contract and partition behavior real. Non-image rows pass through.
    """
    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches):
        for pdf in batches:
            out = pdf.copy()
            pay, meta = [], []
            for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                if k == "image" and p is not None:
                    h = hashlib.md5(bytes(p) + f"|{width}x{height}".encode()).digest()
                    # fake bitmap: one digest block per output row of pixels
                    pay.append(h * max(1, height // 4))
                    m = dict(m) if m is not None else {}
                    m["width"], m["height"] = width, height
                    meta.append(m)
                else:
                    pay.append(p)
                    meta.append(m)
            out["payload"], out["meta"] = pay, meta
            yield out

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "id long, frame_idx int, t_ms int, frame binary"
)


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 max_frames: int = 8) -> DataFrame:
    """Frame sampling over video rows: one output row per sampled frame
    (codec STUBBED — frames are deterministic md5 blocks keyed by
    (payload, t_ms)). The real contract this preserves: a row-EXPANDING
    mapInPandas (1 video -> n frames), frame timestamps from
    meta.duration_ms, bounded fan-out via max_frames — the batch-shape and
    skew profile of real ffmpeg sampling."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches):
        for pdf in batches:
            ids, idxs, ts, frames = [], [], [], []
            for i, k, p, m in zip(pdf["id"], pdf["kind"], pdf["payload"], pdf["meta"]):
                if k != "video" or p is None:
                    continue
                dur = int(m["duration_ms"]) if m is not None else 0
                n = min(max_frames, max(1, dur // every_ms + 1))
                for fi in range(n):
                    t = fi * every_ms
                    ids.append(i)
                    idxs.append(fi)
                    ts.append(t)
                    frames.append(hashlib.md5(bytes(p) + f"|f{t}".encode()).digest())
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "t_ms": ts, "frame": frames}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def synth_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table exercising the binary plumbing."""
    from ..session import ship_package

    ship_package(spark)
    kinds = ["image", "audio", "video"]

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {
                "id": ids,
                "kind": [kinds[int(i) % 3] for i in ids],
                "payload": [
                    hashlib.sha256(f"{seed}:{i}".encode()).digest() * (int(i) % 7 + 1)
                    for i in ids
                ],
                "meta": [
                    {
                        "width": int(i % 1920),
                        "height": int(i % 1080),
                        "duration_ms": int(i * 33),
                        "codec": "stub",
                    }
                    for i in ids
                ],
            }
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_SCHEMA)
