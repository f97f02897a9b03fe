"""NPY parser contract (functions/npy.py): real-format roundtrip for both
element orders, version-2 headers, and hostile-content containment."""

from __future__ import annotations

import io
import struct

import numpy as np

from custom_python_etl_data_connector_rohitharumugams_spark.functions import npy as N


def test_roundtrip_c_and_fortran(spark):
    # doc 6 saves F-ordered (6 % 3 == 0), doc 7 C-ordered
    df = N.synth_npy(spark.createDataFrame([(6,), (7,)], "doc_id long"))
    out = {r.doc_id: r for r in N.decode_npy(df).collect()}
    assert set(out) == {6, 7}
    for i in (6, 7):
        nr, nc = N._npy_dims(i)
        want_sum = sum(N._npy_val(i, r, c) for r in range(nr) for c in range(nc))
        want_w = sum(
            (r + 1) * (c + 1) * N._npy_val(i, r, c)
            for r in range(nr)
            for c in range(nc)
        )
        assert (out[i].n_rows, out[i].n_cols) == (nr, nc)
        assert out[i].value_sum == want_sum
        assert out[i].weighted_sum == want_w


def test_fortran_flag_actually_changes_bytes_not_values():
    """The two layouts must serialize differently yet parse identically —
    otherwise the F-order branch is untested dead code."""
    m = np.arange(12, dtype=np.float32).reshape(3, 4)
    c_buf, f_buf = io.BytesIO(), io.BytesIO()
    np.save(c_buf, m)
    np.save(f_buf, np.asfortranarray(m))
    assert c_buf.getvalue() != f_buf.getvalue()
    mc, mf = N._parse_npy(c_buf.getvalue()), N._parse_npy(f_buf.getvalue())
    assert (mc == mf).all() and (mc == m.astype(np.int64)).all()


def test_version2_header_parses():
    m = np.ones((2, 3), dtype=np.float32)
    header = "{'descr': '<f4', 'fortran_order': False, 'shape': (2, 3), }"
    pad = (64 - (12 + len(header) + 1) % 64) % 64
    h = (header + " " * pad + "\n").encode("ascii")
    raw = N.NPY_MAGIC + bytes([2, 0]) + struct.pack("<I", len(h)) + h + m.tobytes()
    parsed = N._parse_npy(raw)
    assert parsed is not None and parsed.shape == (2, 3) and parsed.sum() == 6


def test_hostile_payloads_contained(spark):
    m = np.ones((2, 2), dtype=np.float32)
    buf = io.BytesIO()
    np.save(buf, m)
    good = buf.getvalue()
    f8 = io.BytesIO()
    np.save(f8, np.ones((2, 2), dtype=np.float64))
    d1 = io.BytesIO()
    np.save(d1, np.ones(4, dtype=np.float32))  # 1-D: out of contract
    hostile = [
        (1, good),
        (100, good[:8]),          # truncated header
        (101, b"not npy at all"),  # wrong magic
        (102, good[:-4]),         # truncated data
        (103, f8.getvalue()),     # float64 dtype
        (104, d1.getvalue()),     # 1-D shape
        (105, N.NPY_MAGIC + bytes([9, 0]) + good[8:]),  # unknown version
        (106, None),
    ]
    df = spark.createDataFrame(hostile, "doc_id long, data binary")
    out = N.decode_npy(df).collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].value_sum == 4


def test_npz_roundtrip_and_containment(spark):
    import zipfile

    df = N.synth_npz(spark.createDataFrame([(5,), (6,)], "doc_id long"))
    rows = {r.shard_id: bytes(r.data) for r in df.collect()}
    # every payload is a genuine zip with exactly the two members
    for payload in rows.values():
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            assert set(z.namelist()) == {"ids.npy", "vecs.npy"}
    # hostile: not-a-zip, missing member, ids/vecs length mismatch
    with zipfile.ZipFile(io.BytesIO(rows[5])) as z:
        ids_only = io.BytesIO()
        with zipfile.ZipFile(ids_only, "w") as zo:
            zo.writestr("ids.npy", z.read("ids.npy"))
        mismatch = io.BytesIO()
        with zipfile.ZipFile(mismatch, "w") as zo:
            short = io.BytesIO()
            np.save(short, np.array([1], dtype=np.int64))
            zo.writestr("ids.npy", short.getvalue())
            zo.writestr("vecs.npy", z.read("vecs.npy"))
    hostile = [
        (5, rows[5]),
        (100, b"PK garbage not zip"),
        (101, ids_only.getvalue()),
        (102, mismatch.getvalue()),
        (103, None),
    ]
    out = N.decode_npz(
        spark.createDataFrame(hostile, "shard_id long, data binary")
    ).collect()
    got = {(r.shard_id, r.vec_id): (r.value_sum, r.weighted_sum) for r in out}
    assert {s for s, _ in got} == {5}
    n = N._npz_rows(5)
    assert len(got) == n
    for j in range(n):
        want = sum(N._npz_val(5, j, c) for c in range(N.NPY_COLS))
        want_w = sum((c + 1) * N._npz_val(5, j, c) for c in range(N.NPY_COLS))
        assert got[(5, 500 + j)] == (want, want_w)


def test_hostile_header_shapes_contained():
    """Review regression: magic-valid payloads whose header literal is a
    list, whose shape is a scalar, or whose shape holds non-ints must
    parse to None (they used to raise AttributeError/TypeError out of
    the containment net and kill the Arrow task)."""

    def v1(header: str) -> bytes:
        h = header.encode("ascii")
        pad = (64 - (10 + len(h) + 1) % 64) % 64
        h = h + b" " * pad + b"\n"
        return N.NPY_MAGIC + bytes([1, 0]) + struct.pack("<H", len(h)) + h

    assert N._parse_npy(v1("[1, 2]")) is None
    assert N._parse_npy(v1("{'descr': '<f4', 'fortran_order': False, 'shape': 5}")) is None
    assert (
        N._parse_npy(v1("{'descr': '<f4', 'fortran_order': False, 'shape': ('a', 2)}"))
        is None
    )


def test_corrupt_deflate_member_contained(spark):
    """Review regression: a zip whose central directory is intact but
    whose member's DEFLATE stream is corrupt raises zlib.error at
    z.read() — decode_npz must contain it (no row), not die. numpy's
    savez writes STORED members, so the deflated archive (the shape
    real shard stores produce with compression on) is built explicitly."""
    import zipfile

    good = bytes(
        N.synth_npz(spark.createDataFrame([(4,)], "doc_id long")).collect()[0].data
    )
    deflated = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(good)) as src, zipfile.ZipFile(
        deflated, "w", compression=zipfile.ZIP_DEFLATED
    ) as dst:
        for name in ("ids.npy", "vecs.npy"):
            dst.writestr(name, src.read(name))
    buf = bytearray(deflated.getvalue())
    with zipfile.ZipFile(io.BytesIO(bytes(buf))) as z:
        info = z.getinfo("vecs.npy")
        assert info.compress_type == zipfile.ZIP_DEFLATED
    # walk the LOCAL header to the compressed data start (name len at
    # offset 26, extra len at 28), then scramble the deflate stream
    name_len, extra_len = struct.unpack_from("<HH", buf, info.header_offset + 26)
    start = info.header_offset + 30 + name_len + extra_len
    for i in range(start, start + min(12, info.compress_size)):
        buf[i] ^= 0xFF
    # sanity: the corruption really does raise zlib.error outside Spark
    import zlib as _zlib

    import pytest as _pytest

    with zipfile.ZipFile(io.BytesIO(bytes(buf))) as z:
        with _pytest.raises((_zlib.error, zipfile.BadZipFile)):
            z.read("vecs.npy")
    rows = [(4, bytes(buf)), (5, bytes(deflated.getvalue()))]
    out = N.decode_npz(
        spark.createDataFrame(rows, "shard_id long, data binary")
    ).collect()
    assert {r.shard_id for r in out} == {5}


def test_zip_bomb_member_contained(spark):
    """Advice regression: a zip member whose DECLARED uncompressed size
    exceeds _MAX_NPZ_MEMBER_BYTES must take the contained no-row path
    BEFORE any inflate call — a deflated run of zeros advertises 64 MiB+
    from a few-KB payload, the classic bomb shape that used to fail only
    via executor OOM."""
    import zipfile

    good = bytes(
        N.synth_npz(spark.createDataFrame([(7,)], "doc_id long")).collect()[0].data
    )
    bomb = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(good)) as src, zipfile.ZipFile(
        bomb, "w", compression=zipfile.ZIP_DEFLATED
    ) as dst:
        dst.writestr("ids.npy", src.read("ids.npy"))
        dst.writestr("vecs.npy", b"\x00" * (N._MAX_NPZ_MEMBER_BYTES + 1))
    payload = bomb.getvalue()
    assert len(payload) < 1 << 20  # the bomb itself is tiny on the wire
    rows = [(7, good), (8, payload)]
    out = N.decode_npz(
        spark.createDataFrame(rows, "shard_id long, data binary")
    ).collect()
    assert {r.shard_id for r in out} == {7}
