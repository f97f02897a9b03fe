"""dHash contract (functions/imagehash.py): upscale invariance as a
theorem (any integer factor, ties included), zero natural collisions at
the fixture corpus, decode containment, and orientation sensitivity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from custom_python_etl_data_connector_rohitharumugams_spark.functions import (
    imagehash as IH,
)


def _hashes(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    return {r.doc_id: r.dhash for r in IH.dhash_bmp(df).collect()}


def test_upscale_invariance_any_factor(spark):
    """2x is what the registered plant uses; 3x and 4x must hold by the
    same block-sum argument (sums scale by n², comparisons preserved)."""
    rows = []
    for d in (0, 7, 17):
        for s in (1, 2, 3, 4):
            rows.append((d * 10 + s, IH._gray_bmp_bytes(d, s)))
    out = _hashes(spark, rows)
    for d in (0, 7, 17):
        base = out[d * 10 + 1]
        for s in (2, 3, 4):
            assert out[d * 10 + s] == base, f"doc {d} scale {s} drifted"


def test_no_natural_collisions_and_planted_recall(spark):
    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    hashed = IH.dhash_bmp(IH.synth_dhash_corpus(docs))
    pairs = sorted(map(tuple, IH.dhash_duplicate_pairs(hashed).collect()))
    want = sorted(
        (d, d + IH.IH_PLANT_OFFSET) for d in range(0, 200, IH.IH_TWIN_MOD)
    )
    assert pairs == want  # ALL plants found, NOTHING else pairs


def test_vertical_flip_changes_hash(spark):
    """A parser that ignores BMP's bottom-up row order reads a flipped
    image; the grid's gradient rows reorder and the hash must change for
    at least some documents — i.e. dHash actually depends on orientation
    handling (it is not symmetric by accident)."""
    import struct

    diffs = 0
    for d in range(8):
        good = IH._gray_bmp_bytes(d, 1)
        w, h = IH.IH_BASE_W, IH.IH_BASE_H
        stride = ((w * 3 + 3) // 4) * 4
        body = good[54:]
        flipped = good[:54] + b"".join(
            body[(h - 1 - y) * stride : (h - y) * stride] for y in range(h)
        )
        out = _hashes(spark, [(1, good), (2, flipped)])
        if out[1] != out[2]:
            diffs += 1
    assert diffs > 0


def test_containment_out_of_contract(spark):
    good = IH._gray_bmp_bytes(3, 1)
    # 20x16: parses as BMP but is not an exact multiple of the 9-wide grid
    import struct

    w, h = 20, 16
    stride = ((w * 3 + 3) // 4) * 4
    off_grid = (
        struct.pack("<2sIHHI", b"BM", 54 + stride * h, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0)
        + b"\x00" * (stride * h)
    )
    rows = [(1, good), (2, good[:40]), (3, b"not a bmp"), (4, None), (5, off_grid)]
    out = _hashes(spark, rows)
    assert set(out) == {1}


def test_pixel_formula_is_nonlinear_enough():
    """Design regression: the gradient-sign matrix must differ across
    documents (the linear formula failure mode is identical sign rows)."""
    mats = []
    for d in range(10):
        m = np.array(
            [[IH._ih_pixel(d, x, y) for x in range(18)] for y in range(16)],
            dtype=np.int64,
        )
        s = m.reshape(8, 2, 9, 2).sum(axis=(1, 3))
        mats.append((s[:, 1:] > s[:, :-1]).tobytes())
    assert len(set(mats)) == 10
