"""Deterministic synthesis of the `pages` input table + text extraction.

Input shape (BASELINE.json input_hint, authoritative):
    pages(url: string, warc_ts: timestamp, html: binary,
          text: string, lang: string)

Every field is a pure function of (row_id, seed) via a splitmix64-style
mixer, so generation is embarrassingly parallel and *partition-independent*:
the same row id yields the same page whether generated on 1 or 1000
executors (`spark.range(n)` + `mapInPandas`). No external data.

Properties engineered into the data:
- `text` embeds exactly one geotag token ``@{lat},{lon}`` with lat in the
  WebMercator domain (cf. gdal2tiles.py GlobalMercator), lon in [-180, 180).
- host -> location is Zipf-skewed (power-law over hosts, hosts cluster
  around a few hot centers) so hot-cell salting and AQE skew handling have
  something to chew on.
- ``html`` is UTF-8 bytes wrapping an HTML-escaped copy of ``text`` such
  that ``extract_text(html) == text`` **byte-identical per url** — the
  per-row invariant verified by tests (the engine analog of the reference's
  golden-checksum discipline, alg/gdalchecksum.cpp:48).
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pandas as pd

N_HOSTS = 1024
N_LANGS = ("en", "de", "fr", "es", "it", "pt", "nl", "pl")
_WORDS = (
    "map tile page crawl web data point layer zoom query spatial join "
    "raster vector cell index mercator pyramid polygon"
).split()
MAX_LAT = 85.05112878
# epoch seconds of 2024-01-01T00:00:00Z
_TS0 = 1704067200


def _mix(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — public-domain integer mixing function."""
    v = (v + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    v ^= v >> np.uint64(30)
    v = (v * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    v ^= v >> np.uint64(27)
    v = (v * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    v ^= v >> np.uint64(31)
    return v


def _u01(v: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniform [0,1) from ids."""
    return _mix(v.astype(np.uint64) ^ np.uint64(salt)).astype(np.float64) / 2.0 ** 64


def synth_pages_pdf(row_ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate pages rows for the given int64 row ids — fully vectorized
    (NumPy unicode-array ops; no per-row Python), ~10x faster than a string
    loop, which matters because bench/scaling runs synthesize 10^6-10^8 rows.
    """
    rid = np.asarray(row_ids, dtype=np.uint64)
    base = rid ^ np.uint64(seed * 0x5DEECE66D)

    # Zipf-ish host skew: u^4 concentrates mass near host 0
    host = (N_HOSTS * _u01(base, 1) ** 4).astype(np.int64)
    hostu = host.astype(np.uint64)
    # host centers spread over the globe; hot hosts share a dense cluster
    c_lon = _u01(hostu, 2) * 360.0 - 180.0
    c_lat = (_u01(hostu, 3) * 2 - 1) * 80.0
    # page jitter ~0.5 degree around the host center
    lat = np.clip(c_lat + (_u01(base, 4) - 0.5), -MAX_LAT, MAX_LAT)
    lon = c_lon + (_u01(base, 5) - 0.5)
    lon = ((lon + 180.0) % 360.0) - 180.0

    lang = np.array(N_LANGS)[(_u01(base, 6) * len(N_LANGS)).astype(np.int64)]

    w = _WORDS  # 20 words, ascii-only (escape-identity safe)
    widx = _mix(base ^ np.uint64(8))
    nw = (4 + (widx % np.uint64(9))).astype(np.int64)  # 4..12 words
    # (n, 12) word-index matrix, then one tight join pass (np.char unicode
    # ops are per-element anyway and 3x slower than this)
    shifts = (3 * np.arange(12, dtype=np.uint64))[None, :]
    mat = ((widx[:, None] >> shifts) % np.uint64(len(w))).astype(np.int64)
    lat_s = np.char.mod("%.6f", lat)
    lon_s = np.char.mod("%.6f", lon)
    # body/geotag contain no &<>, so html-escape is the identity here; the
    # escape/unescape path itself is covered by extract_text unit tests
    texts = [
        " ".join([w[j] for j in row[:k]]) + f" @{la},{lo}"
        for row, k, la, lo in zip(mat.tolist(), nw.tolist(), lat_s, lon_s)
    ]
    html_docs = [
        b"<html><head><title>page</title></head><body><p>"
        + t.encode("utf-8")
        + b"</p></body></html>"
        for t in texts
    ]
    urls = [
        f"https://host{h}.example.com/p/{r}"
        for h, r in zip(host.tolist(), rid.astype(np.int64).tolist())
    ]
    ts = _TS0 + (rid.astype(np.int64) % 31536000)
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.to_datetime(ts, unit="s"),
            "html": html_docs,
            "text": texts,
            "lang": lang,
        }
    )


_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)


def extract_text_bytes(html_bytes: bytes) -> str:
    """html binary -> text, byte-identical to the `text` column.

    Inverse of the synthesis wrapper: take the first <p> block, unescape
    HTML entities. Pure function; used inside an Arrow UDF.
    """
    m = _P_RE.search(html_bytes)
    if not m:
        return ""
    return _html.unescape(m.group(1).decode("utf-8"))


GEOTAG_RE = r"@(-?\d+\.\d+),(-?\d+\.\d+)"


def pages_df(spark, n_rows: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic pages table via spark.range + mapInPandas."""
    from ..session import ship_package

    ship_package(spark)  # generator closure imports this module on workers
    parts = partitions or spark.sparkContext.defaultParallelism
    rng = spark.range(0, n_rows, 1, parts)

    def gen(batches):
        for pdf in batches:
            yield synth_pages_pdf(pdf["id"].to_numpy(), seed)

    return rng.mapInPandas(
        gen, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
