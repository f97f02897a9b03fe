"""Perceptual image dedup (dHash) — near-duplicate IMAGE detection that
survives re-encode and resize, the image twin of the text near-dup family.

A byte hash (sha256 of the payload) only catches bit-identical files; the
training-data problem is the same picture at a different resolution. dHash
(difference hash) canonicalizes every image to a 9x8 luminance grid and
emits 64 bits of horizontal gradient signs — scale changes that preserve
content preserve the gradient signs, so duplicates at different sizes
collide on a 64-bit key and dedup becomes one hash groupBy, exactly the
shuffle shape of exact text dedup (DESIGN.md L1) instead of a pairwise
image comparison.

EXACTNESS ARGUMENT (what makes the oracle a theorem, not a probability):
the grid is computed as BLOCK SUMS over dimensions that are exact
multiples of 9x8, compared within one image only — equal denominators, so
integer sums stand in for means with no rounding anywhere. An n-times
pixel-replicated upscale multiplies every block sum by exactly n², which
preserves every `>` comparison INCLUDING ties — hence a planted 2x
nearest-neighbor twin provably lands in its source's bucket. Natural
fixture images use an xorshift-mixed pixel formula (structured linear
formulas produced 79 dHash collisions in 200 during design; the mixed
form produces 0, pinned by tests/test_imagehash.py).

The decode path is the REAL BMP container: payloads are genuine
uncompressed 24-bit BMPs (bottom-up rows, 4-byte padding) and the parser
is the SAME `_parse_bmp_header` containment gate every other BMP consumer
uses (functions/multimodal.py) — a wrong orientation or stride read
changes gradient rows and breaks the planted-pair oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .multimodal import _parse_bmp_header

#: canonical grid and the base image dims (exact multiples of the grid,
#: so block sums replace means with no rationals)
IH_GRID_W, IH_GRID_H = 9, 8
IH_BASE_W, IH_BASE_H = 18, 16
#: every doc_id % IH_TWIN_MOD == 0 gets a 2x-upscaled twin at
#: doc_id + IH_PLANT_OFFSET (same id-space contract as plans/llm.py plants)
IH_TWIN_MOD = 17
IH_PLANT_OFFSET = 10_000_000

_M32 = (1 << 32) - 1


def _ih_pixel(doc_id: int, x: int, y: int) -> int:
    """xorshift-multiply mixed luminance (0..255): nonlinear in (x, y) so
    gradient signs differ across documents — a linear formula makes every
    row's gradient constant and dHash degenerates (see module docstring)."""
    v = (doc_id * 73856093) ^ (x * 19349663) ^ (y * 83492791)
    v = (v * 2654435761) & _M32
    v ^= v >> 16
    v = (v * 2246822519) & _M32
    return (v >> 8) % 256


def _gray_bmp_bytes(doc_id: int, scale: int) -> bytes:
    """A REAL 24-bit BMP of the doc's luminance grid at ``scale`` x the
    base dims — upscaling by pixel replication (nearest neighbor), R=G=B."""
    import struct

    w, h = IH_BASE_W * scale, IH_BASE_H * scale
    stride = ((w * 3 + 3) // 4) * 4
    img_size = stride * h
    head = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            p = _ih_pixel(doc_id, x // scale, y // scale)
            row += bytes((p, p, p))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    return head + info + b"".join(rows)


def synth_dhash_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, data): one base-size BMP per input doc, plus a 2x
    pixel-replicated twin at doc_id + IH_PLANT_OFFSET for every
    doc_id % IH_TWIN_MOD == 0 — the 1->N batch expansion shape of the
    container tiers, payloads born on the executors."""
    src = df.select(F.col(id_col).alias("doc_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, payloads = [], []
            for raw_id in pdf["doc_id"]:
                doc_id = int(raw_id)
                ids.append(doc_id)
                payloads.append(_gray_bmp_bytes(doc_id, 1))
                if doc_id % IH_TWIN_MOD == 0:
                    ids.append(doc_id + IH_PLANT_OFFSET)
                    payloads.append(_gray_bmp_bytes(doc_id, 2))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "data": payloads}
            )

    return src.mapInPandas(run, schema="doc_id long, data binary")


def dhash_bmp(df: DataFrame) -> DataFrame:
    """(doc_id, dhash): REAL BMP parse (shared containment gate) ->
    luminance matrix in image orientation -> exact block-sum 9x8 grid ->
    64 horizontal gradient-sign bits packed into one signed long. Out of
    contract (corrupt, non-24-bit, dims not exact multiples of the grid)
    yields no row."""
    import numpy as np

    src = df.select("doc_id", "data")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, hashes = [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["data"]):
                if raw is None or pd.isna(doc_id):
                    continue
                parsed = _parse_bmp_header(raw)
                if parsed is None:
                    continue
                w, h, off, stride = parsed
                if w % IH_GRID_W or h % IH_GRID_H:
                    continue  # grid requires exact-multiple dims
                m = np.empty((h, w), dtype=np.int64)
                for yrow in range(h):
                    base = off + yrow * stride
                    row = np.frombuffer(raw, dtype=np.uint8, count=w * 3, offset=base)
                    m[h - 1 - yrow] = row[2::3]  # R channel, image orientation
                s = m.reshape(
                    IH_GRID_H, h // IH_GRID_H, IH_GRID_W, w // IH_GRID_W
                ).sum(axis=(1, 3))
                bits = (s[:, 1:] > s[:, :-1]).astype(np.uint64).ravel()
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                if val >= 1 << 63:
                    val -= 1 << 64  # two's complement into a Spark long
                ids.append(int(doc_id))
                hashes.append(val)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return src.mapInPandas(run, schema="doc_id long, dhash long")


def dhash_duplicate_pairs(hashed: DataFrame) -> DataFrame:
    """(a, b) with a < b for every pair sharing a dhash — one equi
    self-join on the 64-bit key; candidate cost tracks bucket collisions,
    never n². This is the image analog of exact text dedup's digest
    groupBy."""
    left = hashed.select(F.col("doc_id").alias("a"), "dhash")
    right = hashed.select(F.col("doc_id").alias("b"), "dhash")
    return left.join(right, "dhash").where(F.col("a") < F.col("b")).select("a", "b")
