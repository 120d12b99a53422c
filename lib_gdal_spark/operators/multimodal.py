"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Model (SURVEY §1.2 raster-as-rows + BinaryType WKB convention, generalized):
a media row is (id, kind, payload binary, meta struct<width,height,
duration_ms,codec>). Decode / feature-extract / resize / frame-sample run as
Arrow-batched mapInPandas kernels. The codec layer has two tiers:

- `decode_real`: REAL pure-NumPy header+raw parsing for the uncompressed
  container formats (BMP 24/32-bit BI_RGB, PPM/PGM binary, WAV PCM
  8/16-bit) — no codec library needed, same approach as the repo's
  uncompressed-TIFF strip parsing of the reference's pat.tif. Compressed
  formats (JPEG/PNG/MP3/H.264...) raise NotImplementedError with the
  dependency note — the env has no codec libs and faking entropy decode
  would be dishonest.
- `_stub_features`: a clearly-marked deterministic FAKE (payload bytes ->
  stable stats via hashing) kept for plumbing tests and non-decodable
  kinds.

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


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BI_RGB BMP (bottom-up,
    BGR byte order, rows padded to 4)."""
    import struct

    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    rowsz = (w * 3 + 3) & ~3
    rows = np.zeros((h, rowsz), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    return hdr + dib + data


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6); (h, w) -> PGM (P5)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """(n,) or (n, ch) int16 PCM -> RIFF/WAVE."""
    import struct

    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.reshape(-1).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def _decode_bmp(payload: bytes) -> tuple[np.ndarray, dict]:
    import struct

    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bits, comp = (struct.unpack_from("<H", payload, 28)[0],
                  struct.unpack_from("<I", payload, 30)[0])
    if comp != 0 or bits not in (24, 32):
        raise NotImplementedError(
            f"BMP: only uncompressed 24/32-bit BI_RGB supported "
            f"(bits={bits}, compression={comp})")
    topdown = h < 0
    h = abs(h)
    nch = bits // 8
    rowsz = (w * nch + 3) & ~3
    raw = np.frombuffer(payload, np.uint8, count=rowsz * h, offset=off)
    img = raw.reshape(h, rowsz)[:, : w * nch].reshape(h, w, nch)
    if not topdown:
        img = img[::-1]
    img = img[..., 2::-1] if nch == 3 else img[..., [2, 1, 0, 3]]
    return np.ascontiguousarray(img), {"width": w, "height": h,
                                       "channels": nch, "codec": "bmp"}


def _decode_ppm(payload: bytes) -> tuple[np.ndarray, dict]:
    magic = payload[:2]
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while payload[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = toks
    if maxval > 255:
        raise NotImplementedError("PPM/PGM: only 8-bit (maxval<=255)")
    nch = 3 if magic == b"P6" else 1
    raw = np.frombuffer(payload, np.uint8, count=w * h * nch, offset=i)
    img = raw.reshape(h, w, nch) if nch == 3 else raw.reshape(h, w)
    return img, {"width": w, "height": h, "channels": nch,
                 "codec": magic.decode()}


def _decode_wav(payload: bytes) -> tuple[np.ndarray, dict]:
    import struct

    if payload[8:12] != b"WAVE":
        raise NotImplementedError("RIFF container is not WAVE")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid, sz = payload[i : i + 4], struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise NotImplementedError("WAV: missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"WAV: only 8/16-bit PCM (fmt={audio_fmt}, bits={bits})")
    dt = np.uint8 if bits == 8 else np.dtype("<i2")
    s = np.frombuffer(data, dt)
    s = s[: (len(s) // ch) * ch].reshape(-1, ch)
    return s, {"rate": rate, "channels": ch, "bits": bits, "codec": "pcm"}


def decode_real(payload: bytes, kind: str | None = None):
    """Real decode for uncompressed formats, sniffed by magic — pure
    NumPy header+raw parsing, no codec library (same approach as the
    repo's uncompressed-TIFF parsing of the reference's pat.tif).

    -> (ndarray, meta): images (h, w[, c]) uint8; audio (n, ch) PCM.
    Compressed/unknown formats raise NotImplementedError with the
    dependency note."""
    p = bytes(payload)
    if p[:2] == b"BM":
        return _decode_bmp(p)
    if p[:2] in (b"P5", b"P6"):
        return _decode_ppm(p)
    if p[:4] == b"RIFF":
        return _decode_wav(p)
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        # stdlib zlib IS the PNG codec — full decode in sources/png.py
        from ..sources.png import decode_png

        arr, meta = decode_png(p)
        if arr.ndim == 3:  # (bands, h, w) -> (h, w, c) image convention
            arr = np.transpose(arr, (1, 2, 0))
        return arr, {"codec": "png", **{k: meta[k] for k in
                                        ("width", "height", "depth",
                                         "color_type")}}
    if p[:2] == b"\xff\xd8":
        # baseline JPEG decodes natively too — libjpeg-islow bit
        # parity (sources/jpeg.py; albania.jpg band-2 checksum 17016,
        # one of the reference autotest's accepted values)
        from ..sources.jpeg import decode_jpeg

        arr, meta = decode_jpeg(p)
        return arr, {"codec": "jpeg", **meta}
    raise NotImplementedError(
        "decode requires a codec library (PIL/ffmpeg) for compressed "
        "formats; uncompressed BMP/PPM/PGM/WAV, PNG (stdlib zlib) and "
        "baseline JPEG parse natively"
    )


def _stub_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'embedding' from payload bytes (md5-expanded)."""
    h = hashlib.md5(payload).digest()
    raw = np.frombuffer((h * ((dim * 8) // len(h) + 1))[: dim * 8], dtype=np.uint64)
    return (raw.astype(np.float64) / 2.0 ** 64)[:dim]


def _real_features(payload: bytes, dim: int) -> np.ndarray | None:
    """Decode + deterministic stats feature vector:
    image -> [width, height, channels, mean, min, max, ...0-pad]
    audio -> [n_frames, channels, rate, mean, min, max, ...0-pad]
    None when the payload needs a codec library (compressed formats)."""
    try:
        arr, meta = decode_real(payload)
    except (NotImplementedError, ValueError):
        # NotImplementedError: codec not supported natively.
        # ValueError: recognized magic but corrupt/truncated stream —
        # at crawl scale a single bad payload must not kill the job,
        # so both degrade to "no features" instead of raising.
        return None
    a = arr.astype(np.float64)
    if "rate" in meta:  # audio
        head = [float(arr.shape[0]), float(meta["channels"]),
                float(meta["rate"])]
    else:
        head = [float(meta["width"]), float(meta["height"]),
                float(meta["channels"])]
    f = head + [float(a.mean()), float(a.min()), float(a.max())]
    f = (f + [0.0] * dim)[:dim]
    return np.array(f, dtype=np.float64)


def extract_features(media: DataFrame, dim: int = 8,
                     codec: str = "stub") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    codec='real': pure-NumPy decode of uncompressed BMP/PPM/PGM/WAV
    payloads -> dimension/stat features; rows whose format would need a
    codec library come back ok=False with null feat (honest partial
    coverage). codec='stub': deterministic fake features from payload
    hashing (plumbing tests, any payload).

    The Spark-side contract is identical either way: Arrow batches of
    binary in, fixed-dim double arrays out, one output row per input row,
    partition-parallel.
    """
    from ..session import ship_package

    ship_package(media.sparkSession)
    if codec not in ("stub", "real"):
        raise ValueError(f"codec must be 'stub' or 'real', got {codec!r}")

    def run(batches):
        for pdf in batches:
            feats, oks = [], []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    oks.append(False)
                    continue
                if codec == "real":
                    f = _real_features(bytes(p), dim)
                else:
                    f = _stub_features(p, dim)
                feats.append(f.tolist() if f is not None else None)
                oks.append(f is not None)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feat": feats,
                    "ok": oks,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)


def resize_nearest_np(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Center-sampled nearest-neighbor resample: source index of output
    pixel i is floor((i + 0.5) * src / dst) — the overview 'near' kernel
    convention (gcore/overview.cpp nearest; same phase as warp_near)."""
    sh, sw = img.shape[:2]
    ys = np.floor((np.arange(height) + 0.5) * sh / height).astype(np.int64)
    xs = np.floor((np.arange(width) + 0.5) * sw / width).astype(np.int64)
    return img[np.clip(ys, 0, sh - 1)][:, np.clip(xs, 0, sw - 1)]


def resize_images(media: DataFrame, width: int, height: int,
                  codec: str = "stub") -> DataFrame:
    """Resize kernel over image rows.

    codec='real': decode (pure-NumPy BMP/PPM), center-sampled
    nearest-neighbor resample (resize_nearest_np), re-encode in the SAME
    container — a genuine decode->resample->encode pipeline for the
    uncompressed formats; rows whose format needs a codec library pass
    through unchanged (meta untouched, honest partial coverage).
    codec='stub': deterministic md5 fake, plumbing tests only.
    Non-image rows always pass through.
    """
    from ..session import ship_package

    ship_package(media.sparkSession)
    if codec not in ("stub", "real"):
        raise ValueError(f"codec must be 'stub' or 'real', got {codec!r}")

    def run(batches):
        for pdf in batches:
            out = pdf.copy()
            pay, meta = [], []
            for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                if k != "image" or p is None:
                    pay.append(p)
                    meta.append(m)
                    continue
                if codec == "real":
                    try:
                        img, dm = decode_real(bytes(p))
                    except (NotImplementedError, ValueError):
                        # unsupported codec OR corrupt stream: pass the
                        # payload through untouched (crawl-scale jobs
                        # must survive individual bad payloads)
                        pay.append(p)
                        meta.append(m)
                        continue
                    r = resize_nearest_np(img, width, height)
                    if r.ndim == 3 and r.shape[2] == 4:
                        r = r[:, :, :3]   # 32-bit BMP: drop alpha on write
                    if dm["codec"] == "bmp":
                        pay.append(encode_bmp(r))
                    else:
                        pay.append(encode_ppm(r))
                else:
                    h = hashlib.md5(
                        bytes(p) + f"|{width}x{height}".encode()).digest()
                    pay.append(h * max(1, height // 4))
                m = dict(m) if m is not None else {}
                m["width"], m["height"] = width, height
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


def synth_media_real(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL uncompressed payloads —
    BMP / PPM / WAV round-robin, pixel/sample content a pure function of
    (seed, id) — so decode_real exercises genuine parsing end to end."""
    from ..session import ship_package

    ship_package(spark)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            kinds, pays, metas = [], [], []
            for i in ids:
                i = int(i)
                w, h = 4 + i % 5, 3 + i % 4
                base = (np.arange(w * h * 3, dtype=np.int64)
                        * (seed + i) % 251).astype(np.uint8)
                m = i % 3
                if m == 0:
                    pays.append(encode_bmp(base.reshape(h, w, 3)))
                    kinds.append("image")
                    metas.append({"width": w, "height": h,
                                  "duration_ms": 0, "codec": "bmp"})
                elif m == 1:
                    pays.append(encode_ppm(base.reshape(h, w, 3)))
                    kinds.append("image")
                    metas.append({"width": w, "height": h,
                                  "duration_ms": 0, "codec": "ppm"})
                else:
                    n = 64 + i % 32
                    s = ((np.arange(n, dtype=np.int64) * (seed + i)) % 4001
                         - 2000).astype(np.int16)
                    pays.append(encode_wav(s, rate=8000))
                    kinds.append("audio")
                    metas.append({"width": 0, "height": 0,
                                  "duration_ms": n * 1000 // 8000,
                                  "codec": "pcm"})
            yield pd.DataFrame({"id": ids, "kind": kinds,
                                "payload": pays, "meta": metas})

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_SCHEMA)
