"""WebDataset-style TAR shard tier (functions/tarshard.py): round-trip
against the closed-form index, plus the hostile-content containment
ladder — archive-level garbage yields no rows, sample-level damage drops
only the damaged sample, and a bomb-declared member size is rejected
BEFORE any read."""

from __future__ import annotations

import io
import json
import struct
import tarfile

from custom_python_etl_data_connector_rohitharumugams_spark.functions import tarshard as T


def _payload(spark, k: int) -> bytes:
    df = spark.createDataFrame([(k,)], "doc_id long")
    return bytes(T.synth_tar_shards(df).collect()[0].data)


def test_tar_roundtrip_matches_closed_form(spark):
    df = spark.createDataFrame([(3,), (4,)], "doc_id long")
    out = T.decode_tar_shards(T.synth_tar_shards(df)).collect()
    got = {(r.shard_id, r.sample_id): r for r in out}
    want_keys = {
        (k, k * 100 + j) for k in (3, 4) for j in range(T._tar_samples(k))
    }
    assert set(got) == want_keys
    for (k, sid), r in got.items():
        j = sid - k * 100
        assert r.text_chars == T._tar_text_chars(k, j)
        assert r.label == T._tar_label(k, j)
        assert r.bin_len == T._tar_bin_len(j)
        assert r.bin_sum == sum(
            T._tar_bin_byte(k, j, i) for i in range(T._tar_bin_len(j))
        )


def test_tar_hostile_archives_contained(spark):
    """Archive-level damage: not a tar, or an index truncated mid-header,
    must yield zero rows for that shard while healthy shards land."""
    good = _payload(spark, 5)
    hostile = [
        (5, good),
        (100, b"definitely not a tar archive"),
        (101, good[:100]),  # truncated inside the first header block
        (102, None),
    ]
    out = T.decode_tar_shards(
        spark.createDataFrame(hostile, "shard_id long, data binary")
    ).collect()
    assert {r.shard_id for r in out} == {5}
    assert len(out) == T._tar_samples(5)


def test_tar_sample_level_damage_drops_only_that_sample(spark):
    """Rebuild shard 7's archive with sample 0 missing its .json, sample
    1 carrying non-UTF-8 text, and (k has 3 samples) sample 2 intact —
    only the intact sample lands."""
    assert T._tar_samples(7) == 3
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:

        def add(name: str, body: bytes) -> None:
            ti = tarfile.TarInfo(name=name)
            ti.size = len(body)
            tf.addfile(ti, io.BytesIO(body))

        # sample 0: no .json
        add("00000700.txt", b"ttt")
        add("00000700.bin", b"\x01\x02")
        # sample 1: text is not UTF-8
        add("00000701.txt", b"\xff\xfe\xfd")
        add("00000701.json", json.dumps({"label": 1}).encode())
        add("00000701.bin", b"\x03")
        # sample 2: intact
        add("00000702.txt", b"tttt")
        add("00000702.json", json.dumps({"label": 9}).encode())
        add("00000702.bin", bytes([5, 6, 7]))
        # stray member with a non-sample extension: ignored
        add("00000702.cls", b"x")
    out = T.decode_tar_shards(
        spark.createDataFrame([(7, buf.getvalue())], "shard_id long, data binary")
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.sample_id, r.text_chars, r.label, r.bin_len, r.bin_sum) == (
        702,
        4,
        9,
        3,
        18,
    )


def test_tar_bomb_declared_member_contained(spark):
    """A member whose HEADER declares a size over the cap must poison
    exactly its own sample without being read: patch a real archive's
    size field (octal at offset 124, checksum re-summed at 148) so the
    declared size is 1 GiB while the archive stays structurally valid."""
    good = _payload(spark, 8)  # 2 samples: 00000800, 00000801
    buf = bytearray(good)
    # find the header block for 00000800.bin and patch its size field
    name = b"00000800.bin"
    off = buf.index(name + b"\x00")  # header starts at the name field
    assert buf[off + 257 : off + 262] == b"ustar"
    huge = 1 << 30
    buf[off + 124 : off + 136] = b"%011o\x00" % huge
    # recompute the header checksum (spaces during summation, per spec)
    buf[off + 148 : off + 156] = b" " * 8
    chk = sum(buf[off : off + 512])
    buf[off + 148 : off + 156] = b"%06o\x00 " % chk
    out = T.decode_tar_shards(
        spark.createDataFrame(
            [(8, bytes(buf))], "shard_id long, data binary"
        )
    ).collect()
    # sample 800 poisoned by the bomb header; 801 unaffected... unless
    # the bogus size desyncs the walk — either way 800 must NOT land
    assert all(r.sample_id != 800 for r in out)
    assert {r.sample_id for r in out} <= {801}


def test_tar_member_size_cap_constant_sane():
    assert 1 << 20 <= T._MAX_TAR_MEMBER_BYTES <= 1 << 30


def test_write_tar_shards_conforming_and_atomic(spark, tmp_path):
    """The WRITE side produces conforming WebDataset archives: members in
    sorted key order with the txt/json/bin triple per sample, manifest
    counts matching archive contents, no leftover .tmp files, and the
    written archives decode back to the inputs byte-for-byte."""
    import glob
    import os

    rows = [
        (0, 3, "hello world", '{"label": 3}', bytearray(b"\x01\x02")),
        (0, 1, "", '{"label": 1}', bytearray(b"")),
        (1, 2, "abc", '{"label": 2}', bytearray(b"\x05")),
    ]
    df = spark.createDataFrame(
        rows,
        "shard_id long, sample_id long, text string, meta string, payload binary",
    )
    out = str(tmp_path / "shards")
    manifest = {
        r.shard_id: (r.n_samples, r.path)
        for r in T.write_tar_shards(df, out).collect()
    }
    assert {k: v[0] for k, v in manifest.items()} == {0: 2, 1: 1}
    assert not glob.glob(f"{out}/*.tmp.*")
    # member order inside shard 0: sample 1 before sample 3 (sorted keys)
    with tarfile.open(manifest[0][1]) as tf:
        names = tf.getnames()
    assert names == [
        "000000000001.txt", "000000000001.json", "000000000001.bin",
        "000000000003.txt", "000000000003.json", "000000000003.bin",
    ]
    payload = spark.createDataFrame(
        [(k, open(v[1], "rb").read()) for k, v in manifest.items()],
        "shard_id long, data binary",
    )
    got = {
        (r.shard_id, r.sample_id): (r.text_chars, r.label, r.bin_len, r.bin_sum)
        for r in T.decode_tar_shards(payload).collect()
    }
    assert got == {
        (0, 3): (11, 3, 2, 3),
        (0, 1): (0, 1, 0, 0),
        (1, 2): (3, 2, 1, 5),
    }
    assert os.path.basename(manifest[0][1]) == "doc_00000.tar"


def test_tar_bomb_poison_is_sticky_against_duplicate_names(spark):
    """Review regression: a later same-name member must NOT resurrect a
    sample a bomb-declared header already condemned — build an archive
    where x.bin first declares 1 GiB (header only, no body) and a second
    healthy x.bin follows; the sample stays dead while a sibling sample
    lands."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:

        def add(name: str, body: bytes, declared: int | None = None) -> None:
            ti = tarfile.TarInfo(name=name)
            ti.size = len(body) if declared is None else declared
            tf.addfile(ti, io.BytesIO(body))

        add("000000000009.txt", b"ttt")
        add("000000000009.json", json.dumps({"label": 4}).encode())
        # genuinely over-cap member (a real 64 MiB+1 body keeps the walk
        # in sync, so the DUPLICATE-NAME path is what gets exercised —
        # the desynced-walk variant is test_tar_bomb_declared_member_*)
        add("000000000009.bin", b"\x00" * (T._MAX_TAR_MEMBER_BYTES + 1))
        add("000000000009.bin", b"\x01\x02")
        add("000000000011.txt", b"tt")
        add("000000000011.json", json.dumps({"label": 7}).encode())
        add("000000000011.bin", b"\x05")
    out = T.decode_tar_shards(
        spark.createDataFrame([(9, buf.getvalue())], "shard_id long, data binary")
    ).collect()
    assert all(r.sample_id != 9 for r in out)
    assert {r.sample_id for r in out} <= {11}
