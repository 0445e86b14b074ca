"""CobolFileReader tests — mirrors the reference's CobolFileReaderTest
(readAllData on the Cobrix fixtures, nested structs + OCCURS + REDEFINES,
multiple data types, binary/code-page data, schema policies, debug fields,
empty/invalid copybooks) plus engine E2E and split-parallelism checks the
single-iterator reference cannot express."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from kafka_connect_fs_spark.sources.cobol import CobolOptions, read_cobol
from kafka_connect_fs_spark.sources.copybook import (
    CopybookError,
    decode_records,
    ebcdic_to_ascii_table,
    flatten,
    parse_copybook,
    spark_type_for,
)
from kafka_connect_fs_spark.sources.readers import WorkItem, format_for

REF_FIXTURES = "/root/reference/src/test/resources/file/reader/data/cobol"


def item(path: str) -> WorkItem:
    return WorkItem(path=path, start_offset=0, snap_length=os.path.getsize(path))


# ---------------------------------------------------------------- encoder
# Test-side EBCDIC/mainframe ENCODER — the inverse of the module under test,
# so round-trips prove the decoder against independently-constructed bytes.


def enc_text(s: str, width: int) -> bytes:
    return s.ljust(width)[:width].encode("cp037")


def enc_zoned(value: int, digits: int, signed: bool = False) -> bytes:
    """Zoned decimal: EBCDIC digits with sign overpunch in the last zone."""
    a = abs(value)
    ds = str(a).rjust(digits, "0")[-digits:]
    raw = bytearray(ds.encode("cp037"))
    if signed:
        zone = 0xD0 if value < 0 else 0xC0
        raw[-1] = zone | (a % 10)
    return bytes(raw)


def enc_packed(value: int, digits: int) -> bytes:
    """COMP-3 packed BCD: digit nibbles + C/D sign nibble."""
    a = abs(value)
    ds = str(a).rjust(digits, "0")[-digits:]
    if len(ds) % 2 == 0:
        ds = "0" + ds
    nib = [int(c) for c in ds] + [0xD if value < 0 else 0xC]
    out = bytearray()
    for i in range(0, len(nib), 2):
        out.append((nib[i] << 4) | nib[i + 1])
    return bytes(out)


def enc_binary(value: int, nbytes: int) -> bytes:
    return int(value).to_bytes(nbytes, "big", signed=True)


CPY = """
       01  RECORD.
           05  CONV-ID        PIC X(12).
           05  TURN-IDX       PIC 9(4).
           05  TS             PIC 9(10).
           05  SCORE          PIC S9(5)V99 COMP-3.
           05  DELTA          PIC S9(7)    COMP.
           05  TEXT-VAL       PIC X(20).
"""
LRECL = 12 + 4 + 10 + 4 + 4 + 20  # comp-3 S9(5)V99 -> 7 digits -> 4 bytes


def enc_record(conv, turn, ts, score_cents, delta, text) -> bytes:
    return (
        enc_text(conv, 12)
        + enc_zoned(turn, 4)
        + enc_zoned(ts, 10)
        + enc_packed(score_cents, 7)
        + enc_binary(delta, 4)
        + enc_text(text, 20)
    )


# --------------------------------------------------------------- copybook


def test_layout_sizes_and_types():
    root = parse_copybook(CPY)
    assert root.children[0].size == LRECL
    leaves = {l.f.name: l.f for l in flatten(root)}
    assert spark_type_for(leaves["CONV_ID"]) == "string"
    assert spark_type_for(leaves["TURN_IDX"]) == "int"
    assert spark_type_for(leaves["TS"]) == "long"
    assert spark_type_for(leaves["SCORE"]) == "double"  # scaled
    assert spark_type_for(leaves["DELTA"]) == "int"


def test_binary_sizing_buckets():
    """COMP storage: 2/4/8 through 18 digits, bit-exact above (the layout
    in the reference's own Cobrix fixtures: 9(19)/9(20)->9, 9(37)->16)."""
    sizes = {}
    for d in (1, 4, 5, 9, 10, 18, 19, 20, 37):
        root = parse_copybook(f"01 R. 05 F PIC S9({d}) COMP.")
        sizes[d] = root.children[0].children[0].size
    assert sizes == {1: 2, 4: 2, 5: 4, 9: 4, 10: 8, 18: 8, 19: 9, 20: 9, 37: 16}


def test_redefines_shares_offset_and_occurs_extends():
    root = parse_copybook(
        """
        01 R.
           05 A PIC X(8).
           05 B REDEFINES A PIC 9(8).
           05 C OCCURS 3 TIMES PIC 9(2).
        """
    )
    r = root.children[0]
    a, b, c = r.children
    assert (a.offset, b.offset) == (0, 0)
    assert c.offset == 8 and c.extent == 6
    assert r.size == 14


def test_empty_copybook_raises():
    # reference: CobolFileReaderTest emptyCopybook -> ConnectException
    with pytest.raises(CopybookError):
        parse_copybook("   ")


ODO_CPY = (
    "01 R. 05 CNT PIC 9(2). "
    "05 ARR OCCURS 1 TO 4 DEPENDING ON CNT PIC 9(3). "
    "05 TAIL PIC X(2)."
)


def test_occurs_depending_parses_and_validates():
    from kafka_connect_fs_spark.sources.copybook import find_odo, specialize_odo

    root = parse_copybook(ODO_CPY)
    odo, counter = find_odo(root)
    assert (odo.name, odo.occurs, odo.occurs_min, odo.depending_on) == (
        "ARR", 4, 1, "CNT",
    )
    assert counter.name == "CNT" and counter.offset == 0
    # layout sizes the record at MAX occurrences; specialization compacts
    assert root.children[0].size == 2 + 4 * 3 + 2
    assert specialize_odo(root, 2).size == 2 + 2 * 3 + 2
    assert [l.flat for l in flatten(specialize_odo(root, 0))] == ["r__cnt", "r__tail"]
    # plain OCCURS n DEPENDING ON (no TO) also parses
    r2 = parse_copybook("01 R. 05 N PIC 9(2). 05 A OCCURS 5 DEPENDING ON N PIC X.")
    assert find_odo(r2) is not None


def test_occurs_depending_envelope_violations():
    from kafka_connect_fs_spark.sources.copybook import find_odo

    # counter AFTER the array: framing cannot know the length
    with pytest.raises(CopybookError):
        find_odo(parse_copybook(
            "01 R. 05 A OCCURS 1 TO 3 DEPENDING ON N PIC X. 05 N PIC 9(2)."
        ))
    # two ODO items: supported via find_odos, but the single-ODO
    # convenience must refuse rather than silently pick one
    with pytest.raises(CopybookError):
        find_odo(parse_copybook(
            "01 R. 05 N PIC 9(2). 05 A OCCURS 1 TO 3 DEPENDING ON N PIC X. "
            "05 B OCCURS 1 TO 3 DEPENDING ON N PIC X."
        ))
    # unknown counter
    with pytest.raises(CopybookError):
        find_odo(parse_copybook(
            "01 R. 05 A OCCURS 1 TO 3 DEPENDING ON NOPE PIC X."
        ))
    # multiple 01 variants with an ODO
    with pytest.raises(CopybookError):
        find_odo(parse_copybook(
            "01 R1. 05 N PIC 9(2). 05 A OCCURS 1 TO 3 DEPENDING ON N PIC X. "
            "01 R2. 05 X PIC X(5)."
        ))


def _odo_record(cnt: int, items: list[int], tail: str) -> bytes:
    return (f"{cnt:02d}" + "".join(f"{v:03d}" for v in items) + tail).encode("cp037")


def test_decode_records_odo_compacted_layouts():
    """Rows group by counter value; post-array fields decode from their
    COMPACTED per-record offsets; beyond-count occurrences are null."""
    from kafka_connect_fs_spark.sources.copybook import decode_records_odo

    root = parse_copybook(ODO_CPY)
    recs = [
        _odo_record(2, [111, 222], "AB"),
        _odo_record(4, [111, 222, 333, 444], "CD"),
        _odo_record(1, [999], "EF"),
    ]
    lrecl = 16
    m = np.zeros((3, lrecl), np.uint8)
    for i, b in enumerate(recs):
        m[i, : len(b)] = np.frombuffer(b, np.uint8)
    df = decode_records_odo(m, root)
    assert list(df["r__cnt"]) == [2, 4, 1]
    assert list(df["r__tail"]) == ["AB", "CD", "EF"]
    assert list(df["r__arr_0"]) == [111, 111, 999]
    assert df["r__arr_1"][0] == 222 and pd.isna(df["r__arr_1"][2])
    assert pd.isna(df["r__arr_2"][0]) and df["r__arr_3"][1] == 444


def test_read_cobol_odo_variable_records(spark, tmp_path):
    """E2E: back-to-back variable-length ODO records frame sequentially
    (split planner falls back to the per-file path), arrays come out
    trimmed to the counter, post-array fields decode correctly, and
    resume/torn-tail semantics match the RDW path."""
    recs = [
        _odo_record(2, [111, 222], "AB"),
        _odo_record(4, [111, 222, 333, 444], "CD"),
        _odo_record(1, [999], "EF"),
    ]
    p = str(tmp_path / "odo.dt")
    with open(p, "wb") as f:
        f.write(b"".join(recs))
    opts = {"copybook_content": ODO_CPY, "schema_policy": "collapse_root"}
    df = read_cobol(spark, [item(p)], opts)
    rows = df.orderBy("_src_offset").collect()
    assert [r.CNT for r in rows] == [2, 4, 1]
    assert rows[0].ARR == [111, 222] and rows[0].TAIL == "AB"
    assert rows[1].ARR == [111, 222, 333, 444] and rows[1].TAIL == "CD"
    assert rows[2].ARR == [999] and rows[2].TAIL == "EF"
    assert [r._src_offset for r in rows] == [0, 10, 26]
    # resume from the second record's offset: only records past it emit
    got = read_cobol(spark, [WorkItem(p, 10, os.path.getsize(p))], opts)
    assert sorted(r.CNT for r in got.collect()) == [1, 4]
    # torn tail (half a record appended) claims nothing
    with open(p, "ab") as f:
        f.write(_odo_record(3, [123, 456, 789], "GH")[:5])
    assert read_cobol(spark, [item(p)], opts).count() == 3


def test_odo_comp3_and_comp_counters(spark, tmp_path):
    """Review r4: packed (COMP-3) counters must parse their BCD nibbles
    correctly (the sign nibble is C/D/F — two hex chars when formatted
    naively), and unsigned COMP counters must not flip negative."""
    cpy3 = (
        "01 R. 05 CNT PIC 9(3) COMP-3. "
        "05 ARR OCCURS 1 TO 20 DEPENDING ON CNT PIC X(1). "
        "05 TAIL PIC X(2)."
    )
    def rec3(cnt, tail):
        return enc_packed(cnt, 3) + (b"A" * cnt) + tail.encode("cp037")

    p = str(tmp_path / "odo3.dt")
    with open(p, "wb") as f:
        f.write(rec3(12, "XY") + rec3(5, "ZW") + rec3(20, "QQ"))
    rows = (
        read_cobol(spark, [item(p)], {"copybook_content": cpy3, "schema_policy": "collapse_root"})
        .orderBy("_src_offset")
        .collect()
    )
    assert [r.CNT for r in rows] == [12, 5, 20]
    assert [len(r.ARR) for r in rows] == [12, 5, 20]
    assert [r.TAIL for r in rows] == ["XY", "ZW", "QQ"]

    # unsigned COMP counter >= 32768 must stay positive
    from kafka_connect_fs_spark.sources.cobol import _counter_reader
    from kafka_connect_fs_spark.sources.copybook import ebcdic_to_ascii_table

    root = parse_copybook("01 R. 05 N PIC 9(5) COMP. 05 A OCCURS 1 TO 40000 DEPENDING ON N PIC X.")
    leaf = next(l for l in flatten(root) if l.f.name == "N")
    read = _counter_reader(leaf, True, ebcdic_to_ascii_table())
    assert read((40000).to_bytes(4, "big"), 0) == 40000


def test_odo_count_zero_with_sole_child_group():
    """Review r4: count 0 where the ODO array is a group's only child —
    specialize_odo must prune the childless group, not crash _layout."""
    from kafka_connect_fs_spark.sources.copybook import decode_records_odo, specialize_odo

    cpy = (
        "01 R. 05 CNT PIC 9(2). "
        "05 G. 10 A OCCURS 1 TO 3 DEPENDING ON CNT PIC 9(3). "
        "05 TAIL PIC X(2)."
    )
    root = parse_copybook(cpy)
    s0 = specialize_odo(root, 0)
    assert [l.flat for l in flatten(s0)] == ["r__cnt", "r__tail"]
    raw = ("00" + "XY").encode("cp037")
    m = np.zeros((1, 13), np.uint8)
    m[0, :4] = np.frombuffer(raw, np.uint8)
    df = decode_records_odo(m, root)
    assert df["r__cnt"][0] == 0 and df["r__tail"][0] == "XY"
    assert pd.isna(df["r__g__a_0"][0])


def test_occurs_depending_missing_counter_token():
    with pytest.raises(CopybookError, match="no counter name"):
        parse_copybook("01 R. 05 N PIC 9(2). 05 A OCCURS 3 DEPENDING ON.")


def test_odo_property_random_counts_roundtrip():
    """Property: any sequence of counts in [0, max] frames and decodes
    back exactly — lengths, counter values, per-occurrence items, and
    the post-array field all agree with the generator."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_connect_fs_spark.sources.cobol import CobolOptions, _counter_reader, _frame_odo
    from kafka_connect_fs_spark.sources.copybook import (
        decode_records_odo,
        ebcdic_to_ascii_table,
        find_odo,
    )

    cpy = (
        "01 R. 05 CNT PIC 9(2). "
        "05 ARR OCCURS 0 TO 6 DEPENDING ON CNT PIC 9(2). "
        "05 TAIL PIC X(3)."
    )
    root = parse_copybook(cpy)
    odo, counter = find_odo(root)
    leaves = flatten(root)
    counter_leaf = next(l for l in leaves if l.f is counter)
    e2a = ebcdic_to_ascii_table()
    base_size = root.children[0].size
    lrecl = base_size

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.integers(0, 6), min_size=1, max_size=25))
    def check(counts):
        buf = bytearray()
        expected = []
        for i, c in enumerate(counts):
            items = [(i * 7 + j) % 100 for j in range(c)]
            rec = f"{c:02d}" + "".join(f"{v:02d}" for v in items) + f"T{i % 10:02d}"
            buf += rec.encode("cp037")
            expected.append((c, items, f"T{i % 10:02d}"))
        read = _counter_reader(counter_leaf, True, e2a)
        meta = [{
            "reader": read,
            "counter_end": counter_leaf.offset + counter.size,
            "item_size": odo.size, "max_occurs": odo.occurs,
            "min_occurs": odo.occurs_min, "affect": [],
        }]
        recs, offsets = _frame_odo(
            bytes(buf), lrecl, meta, base_size, base=0, emit_from=0,
        )
        assert len(offsets) == len(counts)
        m = np.frombuffer(recs, np.uint8).reshape(len(offsets), lrecl)
        df = decode_records_odo(m, root)
        for i, (c, items, tail) in enumerate(expected):
            assert df["r__cnt"][i] == c
            assert df["r__tail"][i] == tail
            for j in range(odo.occurs):
                got = df[f"r__arr_{j}"][i]
                if j < c:
                    assert got == items[j]
                else:
                    assert pd.isna(got)

    check()


def test_read_cobol_odo_fixed_padded_records(spark, tmp_path):
    """Explicit record_length declares the fixed PADDED convention: the
    array occupies max extent at static offsets; occurrences beyond the
    counter are trimmed during reassembly."""
    lrecl = 16
    recs = [
        _odo_record(2, [111, 222, 0, 0], "AB"),
        _odo_record(4, [111, 222, 333, 444], "CD"),
    ]
    p = str(tmp_path / "odo_fixed.dt")
    with open(p, "wb") as f:
        f.write(b"".join(recs))
    df = read_cobol(
        spark,
        [item(p)],
        {
            "copybook_content": ODO_CPY,
            "schema_policy": "collapse_root",
            "record_length": lrecl,
        },
    )
    rows = df.orderBy("_src_offset").collect()
    assert rows[0].ARR == [111, 222] and rows[0].TAIL == "AB"
    assert rows[1].ARR == [111, 222, 333, 444] and rows[1].TAIL == "CD"
    assert [r._src_offset for r in rows] == [0, 16]


def test_level_88_and_filler_handling():
    root = parse_copybook(
        """
        01 R.
           05 FLAG PIC X.
              88 FLAG-ON VALUE 'Y'.
           05 FILLER PIC X(3).
           05 V PIC 9(2).
        """
    )
    r = root.children[0]
    assert [c.name for c in r.children] == ["FLAG", "FILLER_1", "V"]
    assert r.children[1].is_filler
    assert r.size == 6


# --------------------------------------------------------------- decoding


def test_decode_roundtrip_all_usages():
    rows = [
        ("conv-000001", 1, 1700000001, 12345, 99, "hello world"),
        ("conv-000002", 22, 1700000002, -9876543, -1234567, "EBCDIC text ok"),
        ("conv-000003", 333, 1700000003, 0, 0, ""),
    ]
    raw = b"".join(enc_record(*r) for r in rows)
    m = np.frombuffer(raw, dtype=np.uint8).reshape(len(rows), LRECL)
    root = parse_copybook(CPY)
    df = decode_records(m, flatten(root))
    assert list(df["record__conv_id"]) == [r[0] for r in rows]
    assert list(df["record__turn_idx"]) == [r[1] for r in rows]
    assert list(df["record__ts"]) == [r[2] for r in rows]
    assert list(df["record__score"]) == [r[3] / 100.0 for r in rows]
    assert list(df["record__delta"]) == [r[4] for r in rows]
    assert list(df["record__text_val"]) == [r[5] for r in rows]


def test_decode_zoned_sign_and_garbage_null():
    root = parse_copybook("01 R. 05 V PIC S9(3).")
    leaves = flatten(root)
    good_neg = enc_zoned(-42, 3, signed=True)
    good_pos = enc_zoned(7, 3, signed=True)
    garbage = b"\x41\x42\x43"  # non-digit EBCDIC zones -> null
    m = np.frombuffer(good_neg + good_pos + garbage, np.uint8).reshape(3, 3)
    vals = decode_records(m, leaves)["r__v"]
    assert list(vals[:2]) == [-42, 7]
    assert vals[2] is None or vals.isna()[2]


def test_decode_binary_out_of_precision_null():
    # the reference expects a REDEFINES misread (value beyond the PIC's
    # digits) to decode as null (CobolFileReaderTest checkData TAXPAYER_NUM)
    root = parse_copybook("01 R. 05 V PIC S9(2) COMP.")
    leaves = flatten(root)
    m = np.frombuffer(enc_binary(99, 2) + enc_binary(100, 2), np.uint8).reshape(2, 2)
    vals = decode_records(m, leaves)["r__v"]
    assert vals[0] == 99
    assert vals.isna()[1]


def test_decode_ascii_mode():
    root = parse_copybook("01 R. 05 NAME PIC X(4). 05 N PIC 9(3).")
    m = np.frombuffer(b"abc 042xyz 107", np.uint8).reshape(2, 7)
    df = decode_records(m, flatten(root), ebcdic=False)
    assert list(df["r__name"]) == ["abc", "xyz"]
    assert list(df["r__n"]) == [42, 107]


def test_trimming_policies():
    root = parse_copybook("01 R. 05 S PIC X(6).")
    m = np.frombuffer(enc_text(" ab ", 6), np.uint8).reshape(1, 6)
    # " ab " padded to width 6 -> " ab   "
    for trim, exp in (("both", "ab"), ("left", "ab   "), ("right", " ab"), ("none", " ab   ")):
        df = decode_records(m, flatten(root), trim=trim)
        assert df["r__s"][0] == exp, trim


def test_code_page_table():
    # cp037 and cp500 disagree on a handful of codepoints, e.g. 0x4A
    t37, t500 = ebcdic_to_ascii_table("cp037"), ebcdic_to_ascii_table("cp500")
    assert not np.array_equal(t37, t500)
    assert chr(t37[0xC1]) == chr(t500[0xC1]) == "A"


# ------------------------------------------------------------- spark path


def write_fixture(path, rows):
    with open(path, "wb") as f:
        for r in rows:
            f.write(enc_record(*r))


ROWS = [
    (f"conv-{i:06d}", i % 7, 1700000000 + i, (i - 50) * 100 + 7, i * 3 - 60, f"text {i}")
    for i in range(100)
]


def test_read_cobol_spark_flat(spark, tmp_path):
    p = str(tmp_path / "data.dt")
    write_fixture(p, ROWS)
    df = read_cobol(
        spark, [item(p)], {"copybook_content": CPY, "schema_policy": "collapse_root"}
    )
    got = df.orderBy("_src_offset").collect()
    assert len(got) == 100
    for i, r in enumerate(got):
        exp = ROWS[i]
        assert r.CONV_ID == exp[0]
        assert r.TURN_IDX == exp[1]
        assert r.TS == exp[2]
        assert r.SCORE == pytest.approx(exp[3] / 100.0)
        assert r.DELTA == exp[4]
        assert r.TEXT_VAL == exp[5]
        assert r._src_offset == i * LRECL


def test_read_cobol_split_parallelism_matches_single(spark, tmp_path):
    """Fixed-length files split at record boundaries across tasks — the
    distributed plan the reference's per-file iterator cannot have."""
    p = str(tmp_path / "big.dt")
    write_fixture(p, ROWS)
    opts = {"copybook_content": CPY, "schema_policy": "collapse_root"}
    one = read_cobol(spark, [item(p)], opts).orderBy("_src_offset").collect()
    # force many tiny splits: chunk = max(split_mb*MB // lrecl, 1) * lrecl
    many = read_cobol(spark, [item(p)], {**opts, "input_split_size_mb": 0})
    assert many.rdd.getNumPartitions() >= 1
    assert many.orderBy("_src_offset").collect() == one


def test_read_cobol_resume_from_offset(spark, tmp_path):
    p = str(tmp_path / "resume.dt")
    write_fixture(p, ROWS)
    w = WorkItem(path=p, start_offset=50 * LRECL, snap_length=os.path.getsize(p))
    got = read_cobol(
        spark, [w], {"copybook_content": CPY, "schema_policy": "collapse_root"}
    ).orderBy("_src_offset").collect()
    assert [r.CONV_ID for r in got] == [r[0] for r in ROWS[50:]]
    # mid-record offset rounds DOWN (torn append recovery, never loss)
    w2 = WorkItem(path=p, start_offset=50 * LRECL + 3, snap_length=os.path.getsize(p))
    got2 = read_cobol(
        spark, [w2], {"copybook_content": CPY, "schema_policy": "collapse_root"}
    ).count()
    assert got2 == 50


def test_read_cobol_torn_tail_ignored(spark, tmp_path):
    p = str(tmp_path / "torn.dt")
    write_fixture(p, ROWS[:10])
    with open(p, "ab") as f:
        f.write(enc_record(*ROWS[10])[: LRECL // 2])
    df = read_cobol(spark, [item(p)], {"copybook_content": CPY})
    assert df.count() == 10


def test_read_cobol_rdw_sequence(spark, tmp_path):
    """RDW framing: 4-byte descriptor per record (length little-endian at
    bytes 2-3, the layout in the reference's Cobrix fixtures; big-endian at
    bytes 0-1 with is_rdw_big_endian)."""
    p_le, p_be = str(tmp_path / "le.dt"), str(tmp_path / "be.dt")
    with open(p_le, "wb") as fle, open(p_be, "wb") as fbe:
        for r in ROWS[:20]:
            payload = enc_record(*r)
            fle.write(b"\x00\x00" + len(payload).to_bytes(2, "little") + payload)
            fbe.write(len(payload).to_bytes(2, "big") + b"\x00\x00" + payload)
    base = {"copybook_content": CPY, "schema_policy": "collapse_root",
            "is_record_sequence": True}
    got_le = read_cobol(spark, [item(p_le)], base).orderBy("_src_offset").collect()
    got_be = read_cobol(
        spark, [item(p_be)], {**base, "is_rdw_big_endian": True}
    ).orderBy("_src_offset").collect()
    assert [r.CONV_ID for r in got_le] == [r[0] for r in ROWS[:20]]
    assert [(r.CONV_ID, r.TS) for r in got_be] == [(r.CONV_ID, r.TS) for r in got_le]
    # RDW offsets point at each record's descriptor word
    assert got_le[1]._src_offset == 4 + LRECL


def test_read_cobol_keep_original_nesting(spark, tmp_path):
    p = str(tmp_path / "nest.dt")
    write_fixture(p, ROWS[:5])
    df = read_cobol(spark, [item(p)], {"copybook_content": CPY})
    assert df.schema["RECORD"].dataType.typeName() == "struct"
    r0 = df.orderBy("_src_offset").limit(1).collect()[0]
    assert r0.RECORD.CONV_ID == ROWS[0][0]


def test_read_cobol_missing_copybook_raises(spark):
    with pytest.raises(CopybookError):
        read_cobol(spark, [], {})
    with pytest.raises(CopybookError):
        read_cobol(spark, [], {"copybook_path": "/nonexistent/x.cpy"})


def test_copybook_from_path(spark, tmp_path):
    cpy_path = str(tmp_path / "schema.cpy")
    with open(cpy_path, "w") as f:
        f.write(CPY)
    p = str(tmp_path / "d.dt")
    write_fixture(p, ROWS[:3])
    df = read_cobol(
        spark, [item(p)], {"copybook_path": cpy_path, "schema_policy": "collapse_root"}
    )
    assert df.count() == 3


def test_explicit_record_length_pads_copybook(spark, tmp_path):
    """record_length > copybook size: trailing filler bytes are skipped."""
    p = str(tmp_path / "pad.dt")
    with open(p, "wb") as f:
        for r in ROWS[:4]:
            f.write(enc_record(*r) + b"\x00" * 10)
    df = read_cobol(
        spark, [item(p)],
        {"copybook_content": CPY, "schema_policy": "collapse_root",
         "record_length": LRECL + 10},
    )
    got = df.orderBy("_src_offset").collect()
    assert [r.CONV_ID for r in got] == [r[0] for r in ROWS[:4]]


def test_format_for_dispatches_dt():
    assert format_for("s3://bucket/dir/part-00.dt") == "cobol"


def test_engine_e2e_cobol_merge(spark, tmp_path):
    """Mainframe dump -> discovery -> cobol decode -> LWW MERGE lake, by
    extension dispatch: the reference's connector flow (AgnosticFileReader
    + CobolFileReader) as one engine run."""
    from kafka_connect_fs_spark.streaming.engine import IngestConfig, IngestEngine

    src = tmp_path / "src"
    os.makedirs(src)
    write_fixture(str(src / "dump-0.dt"), ROWS[:60])
    write_fixture(str(src / "dump-1.dt"), ROWS[60:])
    engine = IngestEngine(
        spark,
        IngestConfig(
            uris=[str(src)],
            table_root=str(tmp_path / "table"),
            checkpoint_root=str(tmp_path / "ckpt"),
            fmt="agnostic",
            reader_options={"copybook_content": CPY, "schema_policy": "collapse_root"},
            keys=("CONV_ID", "TURN_IDX"),
            ts_col="TS",
            n_buckets=4,
        ),
    )
    res = engine.run_once()
    assert res.n_files == 2
    state = {(r.CONV_ID, r.TURN_IDX): r.TEXT_VAL for r in engine.lake.read().collect()}
    exp = {}
    for conv, turn, ts, _sc, _d, text in ROWS:
        exp[(conv, turn)] = text  # unique keys here; LWW trivial
    assert state == exp
    # second run: no new files, no new rows
    res2 = engine.run_once()
    assert res2.n_files == 0


# ------------------------------------------------- reference fixture parity


needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_FIXTURES), reason="reference fixtures not available"
)


@needs_ref
def test_reference_companies_fixture(spark):
    """The reference's readAllData expectations, bit-for-bit
    (CobolFileReaderTest.checkData): RDW sequence, nested structs, OCCURS
    array, REDEFINES misread -> null."""
    cpy = open(f"{REF_FIXTURES}/companies.cpy").read()
    df = read_cobol(
        spark, [item(f"{REF_FIXTURES}/companies.dt")],
        {"copybook_content": cpy, "is_record_sequence": True},
    )
    rows = df.orderBy("_src_offset").collect()
    assert len(rows) == 100
    for i, r in enumerate(rows):
        cd = r.COMPANY_DETAILS
        sd = cd.STATIC_DETAILS
        assert cd.SEGMENT_ID == "C"
        assert cd.COMPANY_ID == "%010d" % i
        assert sd.COMPANY_NAME == "Sample Q&A Ltd."
        assert sd.ADDRESS == "223344 AK ave, Wonderland"
        assert sd.TAXPAYER.TAXPAYER_TYPE == "A"
        assert sd.TAXPAYER.TAXPAYER_STR == "88888888"
        assert sd.TAXPAYER.TAXPAYER_NUM is None
        assert len(sd.STRATEGY.STRATEGY_DETAIL) == 6
        assert sd.STRATEGY.STRATEGY_DETAIL[0].NUM1 == 1111111
        assert sd.STRATEGY.STRATEGY_DETAIL[0].NUM2 == 2222222


@needs_ref
def test_reference_companies_debug_fields(spark):
    cpy = open(f"{REF_FIXTURES}/companies.cpy").read()
    df = read_cobol(
        spark, [item(f"{REF_FIXTURES}/companies.dt")],
        {"copybook_content": cpy, "is_record_sequence": True,
         "debug_fields_policy": "raw"},
    )
    r = df.limit(1).collect()[0]
    assert r.COMPANY_DETAILS.COMPANY_ID_debug
    assert r.COMPANY_DETAILS.STATIC_DETAILS.COMPANY_NAME_debug


@needs_ref
def test_reference_type_variety_fixture(spark):
    """readAllDataWithMultipleDataTypes: 27 numeric families (display /
    COMP / COMP-3, signed & scaled, 1..37 digits) + IEEE-754 floats."""
    cpy = open(f"{REF_FIXTURES}/type-variety.cpy").read()
    df = read_cobol(
        spark, [item(f"{REF_FIXTURES}/type-variety.dt")],
        {"copybook_content": cpy, "schema_policy": "collapse_root",
         "floating_point_format": "ieee754", "is_record_sequence": False},
    )
    rows = df.orderBy("_src_offset").collect()
    assert len(rows) == 100
    for i, r in enumerate(rows):
        assert r.ID == i + 1
        assert r.STRING_VAL == "Sample"
    # display/COMP/COMP-3 encodings of the same digit stream agree
    r0 = rows[0]
    assert r0.NUM_STR_INT05 == r0.NUM_BIN_INT05 == r0.NUM_BCD_INT05 == 58298


@needs_ref
def test_reference_code_pages_fixture(spark):
    """readAllDataWithBinaryData: every field non-null, typed string."""
    cpy = open(f"{REF_FIXTURES}/code-pages.cpy").read()
    df = read_cobol(
        spark, [item(f"{REF_FIXTURES}/code-pages.dt")],
        {"copybook_content": cpy, "schema_policy": "collapse_root",
         "is_record_sequence": False},
    )
    rows = df.collect()
    assert len(rows) == 100
    for r in rows:
        d = r.asDict()
        assert all(v is not None for v in d.values()), d
    assert {type(r.CURRENCY) for r in rows} == {str}


# ---------------------------------------------------------------- property


def test_property_encode_decode_roundtrip():
    """Hypothesis: for arbitrary (digits, scale, usage, sign) field specs
    and in-range values, encode_records ∘ decode_records is identity.
    Catches sign-overpunch, nibble-packing, and scale/precision edges the
    example tests miss."""
    from hypothesis import given, settings, strategies as st

    from kafka_connect_fs_spark.sources.copybook import (
        decode_records,
        encode_records,
    )

    usages = st.sampled_from(["display", "comp", "comp3"])

    @st.composite
    def field_spec(draw):
        usage = draw(usages)
        digits = draw(st.integers(min_value=1, max_value=18))
        scale = draw(st.integers(min_value=0, max_value=min(4, digits)))
        signed = draw(st.booleans())
        return usage, digits, scale, signed

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def inner(data):
        specs = data.draw(st.lists(field_spec(), min_size=1, max_size=5))
        lines = ["       01  REC."]
        for i, (usage, digits, scale, signed) in enumerate(specs):
            pic = ("S" if signed else "") + f"9({digits - scale})"
            if scale:
                pic += f"V9({scale})"
            u = {"display": "", "comp": " COMP", "comp3": " COMP-3"}[usage]
            lines.append(f"           05  F-{i}  PIC {pic}{u}.")
        root = parse_copybook("\n".join(lines))
        rows = []
        for _r in range(data.draw(st.integers(min_value=1, max_value=4))):
            row = {}
            for i, (usage, digits, scale, signed) in enumerate(specs):
                # scaled values go through float: keep them float-exact
                # (<= 15 significant digits); integers are exact end-to-end
                eff = min(digits, 14) if scale else digits
                limit = 10 ** eff - 1
                lo = -limit if signed else 0
                iv = data.draw(st.integers(min_value=lo, max_value=limit))
                # store the SCALED value; the field holds iv / 10^scale
                row[f"f_{i}"] = iv / (10 ** scale) if scale else iv
            rows.append(row)
        raw = encode_records(rows, root)
        lrecl = root.children[0].size
        m = np.frombuffer(raw, dtype=np.uint8).reshape(len(rows), lrecl)
        df = decode_records(m, flatten(root))
        for i, (usage, digits, scale, signed) in enumerate(specs):
            got = df[f"rec__f_{i}"]
            for r_idx, row in enumerate(rows):
                exp = row[f"f_{i}"]
                if scale:
                    assert got[r_idx] == pytest.approx(exp, abs=10 ** -(scale + 6)), (
                        usage, digits, scale, signed, exp, got[r_idx])
                else:
                    assert int(got[r_idx]) == exp, (
                        usage, digits, scale, signed, exp, got[r_idx])

    inner()


def test_engine_cobol_append_resumes_at_record_boundary(spark, tmp_path):
    """Append more EBCDIC records (plus a torn tail) to an already-
    ingested fixed-length file: the next trigger ingests only complete
    new records; the torn record is recovered once completed (the
    floor-rounding resume — no loss, no duplicates through the MERGE)."""
    from kafka_connect_fs_spark.streaming.engine import IngestConfig, IngestEngine

    src = tmp_path / "src"
    os.makedirs(src)
    p = str(src / "dump.dt")
    write_fixture(p, ROWS[:30])
    engine = IngestEngine(
        spark,
        IngestConfig(
            uris=[str(src)],
            table_root=str(tmp_path / "table"),
            checkpoint_root=str(tmp_path / "ckpt"),
            fmt="agnostic",
            reader_options={"copybook_content": CPY, "schema_policy": "collapse_root"},
            keys=("CONV_ID", "TURN_IDX"),
            ts_col="TS",
            n_buckets=2,
        ),
    )
    engine.run_once()
    assert engine.lake.read().count() == 30
    # append 10 full records + half of an 11th
    with open(p, "ab") as f:
        for r in ROWS[30:40]:
            f.write(enc_record(*r))
        f.write(enc_record(*ROWS[40])[: LRECL // 2])
    engine.run_once()
    state = {(r.CONV_ID, r.TURN_IDX) for r in engine.lake.read().collect()}
    assert state == {(r[0], r[1]) for r in ROWS[:40]}  # torn 41st not yet
    # complete the torn record: next trigger recovers exactly it
    with open(p, "ab") as f:
        f.write(enc_record(*ROWS[40])[LRECL // 2 :])
    engine.run_once()
    state = {(r.CONV_ID, r.TURN_IDX) for r in engine.lake.read().collect()}
    assert state == {(r[0], r[1]) for r in ROWS[:41]}


def test_engine_odo_append_emits_only_new_records(spark, tmp_path):
    """Engine tailing a growing VARIABLE-LENGTH (ODO) file: the second
    trigger emits only the appended records (emit_from from the
    committed watermark), a torn appended record is held back, and the
    lake's final state covers exactly the complete records."""
    from kafka_connect_fs_spark.streaming.engine import IngestConfig, IngestEngine

    src = tmp_path / "src"
    os.makedirs(src)
    cpy = (
        "01 R. 05 CONV_ID PIC X(8). 05 TURN_IDX PIC 9(2). 05 TS PIC 9(10). "
        "05 CNT PIC 9(2). 05 ITEMS OCCURS 0 TO 5 DEPENDING ON CNT PIC 9(3)."
    )

    def rec(conv, turn, ts_val, items):
        return (
            f"{conv:<8s}{turn:02d}{ts_val:010d}{len(items):02d}"
            + "".join(f"{v:03d}" for v in items)
        ).encode("cp037")

    p = str(src / "var.dt")
    batch1 = [rec(f"c{i}", i % 4, 1700000000 + i, [i * 10 + j for j in range(i % 6)]) for i in range(10)]
    with open(p, "wb") as f:
        f.write(b"".join(batch1))
    engine = IngestEngine(
        spark,
        IngestConfig(
            uris=[str(src)],
            table_root=str(tmp_path / "table"),
            checkpoint_root=str(tmp_path / "ckpt"),
            fmt="agnostic",
            reader_options={"copybook_content": cpy, "schema_policy": "collapse_root"},
            keys=("CONV_ID", "TURN_IDX"),
            ts_col="TS",
            n_buckets=2,
        ),
    )
    engine.run_once()
    assert engine.lake.read().count() == 10
    # append 3 complete records + a torn 4th (cut inside its items)
    extra = [rec(f"x{i}", i, 1700001000 + i, [7, 8, 9][: i + 1]) for i in range(3)]
    torn = rec("torn", 9, 1700002000, [1, 2, 3, 4])
    with open(p, "ab") as f:
        f.write(b"".join(extra) + torn[: len(torn) - 4])
    r2 = engine.run_once()
    assert r2.n_events == 3  # only the complete appended records
    state = {r.CONV_ID.strip(): r.ITEMS for r in engine.lake.read().collect()}
    assert state["x0"] == [7] and state["x2"] == [7, 8, 9]
    assert "torn" not in state
    # complete the torn record: exactly it arrives next trigger
    with open(p, "ab") as f:
        f.write(torn[len(torn) - 4 :])
    r3 = engine.run_once()
    assert r3.n_events == 1
    assert {r.CONV_ID.strip() for r in engine.lake.read().collect()} >= {"torn"}


def test_rdw_append_emits_only_new_records(spark, tmp_path):
    """RDW resume: framing restarts at byte 0 (sequential format) but
    only records extending past the committed offset are emitted — an
    appended record-sequence file does not re-emit its history, and a
    record torn at the snapshot boundary is recovered once complete."""
    p = str(tmp_path / "seq.dt")
    def rdw(payload: bytes) -> bytes:
        return b"\x00\x00" + len(payload).to_bytes(2, "little") + payload
    with open(p, "wb") as f:
        for r in ROWS[:20]:
            f.write(rdw(enc_record(*r)))
    size1 = os.path.getsize(p)
    base = {"copybook_content": CPY, "schema_policy": "collapse_root",
            "is_record_sequence": True}
    # resume from committed offset = size1: history not re-emitted
    with open(p, "ab") as f:
        for r in ROWS[20:25]:
            f.write(rdw(enc_record(*r)))
    w = WorkItem(path=p, start_offset=size1, snap_length=os.path.getsize(p))
    got = read_cobol(spark, [w], base).orderBy("_src_offset").collect()
    assert [r.CONV_ID for r in got] == [r[0] for r in ROWS[20:25]]
    # torn record at the boundary: committed offset sits mid-record;
    # the completed record is recovered, fully-before records are not
    rec = rdw(enc_record(*ROWS[25]))
    with open(p, "ab") as f:
        f.write(rec[: len(rec) // 2])
    torn_committed = os.path.getsize(p)
    with open(p, "ab") as f:
        f.write(rec[len(rec) // 2 :])
    w2 = WorkItem(path=p, start_offset=torn_committed, snap_length=os.path.getsize(p))
    got2 = read_cobol(spark, [w2], base).collect()
    assert [r.CONV_ID for r in got2] == [ROWS[25][0]]


def test_occurs_debug_fields_present(spark, tmp_path):
    """debug_fields_policy=raw keeps per-occurrence raw-hex columns for
    OCCURS leaves too (they decode anyway; dropping them was a bug)."""
    cpy = """
       01  R.
           05  AMT  PIC S9(3) COMP-3 OCCURS 3.
    """
    p = str(tmp_path / "occ.dt")
    with open(p, "wb") as f:
        f.write(enc_packed(1, 3) + enc_packed(-2, 3) + enc_packed(3, 3))
    df = read_cobol(
        spark, [item(p)],
        {"copybook_content": cpy, "schema_policy": "collapse_root",
         "debug_fields_policy": "raw"},
    )
    r = df.collect()[0]
    assert list(r.AMT) == [1, -2, 3]
    assert len(r.AMT_debug) == 3 and all(isinstance(h, str) and h for h in r.AMT_debug)


def test_edited_picture_with_insertion_chars():
    """PIC 9(3)B9(3) (blank insertion): char_size != digits must route to
    the string-parse path, not crash the vectorized zoned decode."""
    root = parse_copybook("01 R. 05 F PIC 9(3)B9(3).")
    f = root.children[0].children[0]
    assert f.size == 7 and f.pic.digits == 6 and f.pic.edited
    raw = "123 456".encode("cp037")
    m = np.frombuffer(raw, np.uint8).reshape(1, 7)
    got = decode_records(m, flatten(root))["r__f"][0]
    assert got == 123456


def test_free_format_copybook_with_short_indent():
    """A free-format copybook indented 1-5 spaces must not lose its level
    numbers to the fixed-format column strip (parse retries free mode)."""
    root = parse_copybook("01 REC.\n  05  FLD PIC X(4).\n  05  N PIC 9(2).")
    rec = root.children[0]
    assert [c.name for c in rec.children] == ["FLD", "N"]
    assert rec.size == 6


# ----------------------------------------------- review-fix regressions (r3b)


def test_multiple_fillers_occupy_layout_but_not_output():
    root = parse_copybook(
        "01 R. 05 A PIC X(2). 05 FILLER PIC X(3). 05 B PIC 9(4). 05 FILLER PIC X(6)."
    )
    assert root.children[0].size == 15  # fillers still take bytes
    leaves = flatten(root)
    assert [l.flat for l in leaves] == ["r__a", "r__b"]
    raw = ("AB" + "xxx" + "0042" + "......").encode("cp037")
    m = np.frombuffer(raw, np.uint8).reshape(1, 15)
    df = decode_records(m, leaves)
    assert df["r__a"][0] == "AB" and df["r__b"][0] == 42


def test_read_cobol_with_filler(spark, tmp_path):
    """ADVICE r4 high: _assemble must skip FILLER columns that flatten()
    never decoded — any copybook with a FILLER used to raise
    UNRESOLVED_COLUMN on the Spark read path."""
    cpy = "01 R. 05 A PIC X(2). 05 FILLER PIC X(3). 05 B PIC 9(4)."
    raw = ("AB" + "xxx" + "0042").encode("cp037") + ("CD" + "yyy" + "0007").encode("cp037")
    p = str(tmp_path / "filler.dt")
    with open(p, "wb") as f:
        f.write(raw)
    for policy in ("collapse_root", "keep_original"):
        df = read_cobol(
            spark, [item(p)], {"copybook_content": cpy, "schema_policy": policy}
        ).orderBy("_src_offset")
        rows = df.collect()
        if policy == "collapse_root":
            assert [c for c in df.columns if not c.startswith("_src")] == ["A", "B"]
            assert (rows[0].A, rows[0].B) == ("AB", 42)
            assert (rows[1].A, rows[1].B) == ("CD", 7)
        else:
            assert rows[0].R.asDict() == {"A": "AB", "B": 42}


def test_read_cobol_filler_group_and_debug(spark, tmp_path):
    """FILLER groups with named children keep those children (under the
    unique FILLER_n struct); all-filler subtrees vanish; debug mode must
    not emit debug columns for skipped fillers."""
    cpy = (
        "01 R. 05 A PIC X(1). "
        "05 FILLER. 10 INNER PIC 9(2). 10 FILLER PIC X(1). "
        "05 FILLER. 10 FILLER PIC X(2). "
        "05 B PIC X(1)."
    )
    raw = ("Z" + "42" + "x" + "yy" + "Q").encode("cp037")
    p = str(tmp_path / "fg.dt")
    with open(p, "wb") as f:
        f.write(raw)
    df = read_cobol(
        spark,
        [item(p)],
        {"copybook_content": cpy, "schema_policy": "collapse_root", "debug": True},
    )
    r = df.collect()[0]
    assert r.A == "Z" and r.B == "Q"
    assert r.FILLER_1.asDict()["INNER"] == 42
    assert "FILLER_3" not in df.columns  # all-filler subtree dropped


def test_sibling_filler_groups_do_not_collide():
    """ADVICE r4 low: two sibling FILLER groups with same-named children
    must produce distinct flat names, not silently overwrite."""
    root = parse_copybook(
        "01 R. 05 FILLER. 10 V PIC 9(2). 05 FILLER. 10 V PIC 9(3)."
    )
    leaves = flatten(root)
    flats = [l.flat for l in leaves]
    assert len(set(flats)) == 2
    assert flats == ["r__filler_1__v", "r__filler_2__v"]
    raw = ("12" + "345").encode("cp037")
    m = np.frombuffer(raw, np.uint8).reshape(1, 5)
    df = decode_records(m, leaves)
    assert df[flats[0]][0] == 12 and df[flats[1]][0] == 345


def test_string_path_exact_18_digit_int_with_bad_row():
    """One unparseable row must not coerce the whole batch to float64 and
    round 16+-digit integers (ASCII decode path)."""
    root = parse_copybook("01 R. 05 V PIC 9(18).")
    big = 123456789012345678
    rows = [str(big).encode().rjust(18, b"0"), b"x" * 18]
    m = np.frombuffer(b"".join(rows), np.uint8).reshape(2, 18)
    vals = decode_records(m, flatten(root), ebcdic=False)["r__v"]
    assert int(vals[0]) == big  # exact, not 123456789012345680
    assert vals.isna()[1]


def test_multiple_01_records_overlay_at_offset_zero():
    """Multi-root copybooks are record VARIANTS: both overlay offset 0
    (implicit REDEFINES), lrecl = max root size — not the sum."""
    root = parse_copybook("01 REC-A. 05 A PIC X(4). 01 REC-B. 05 B PIC 9(4).")
    a, b = root.children
    assert a.offset == 0 and b.offset == 0
    assert max(c.offset + c.extent for c in root.children) == 4
    raw = "0042".encode("cp037")
    m = np.frombuffer(raw, np.uint8).reshape(1, 4)
    df = decode_records(m, flatten(root))
    assert df["rec_a__a"][0] == "0042" and df["rec_b__b"][0] == 42


def test_encode_absent_redefines_overlay_does_not_clobber():
    from kafka_connect_fs_spark.sources.copybook import encode_records

    root = parse_copybook("01 R. 05 A PIC X(4). 05 B REDEFINES A PIC 9(4).")
    raw = encode_records([{"a": "WXYZ"}], root)
    m = np.frombuffer(raw, np.uint8).reshape(1, 4)
    df = decode_records(m, flatten(root))
    assert df["r__a"][0] == "WXYZ"  # not zoned zeros


def test_collapse_root_elementary_01(spark, tmp_path):
    p = str(tmp_path / "elem.dt")
    with open(p, "wb") as f:
        f.write("HELLOWORLD".encode("cp037"))
    df = read_cobol(
        spark, [item(p)],
        {"copybook_content": "01 X PIC X(10).", "schema_policy": "collapse_root"},
    )
    r = df.collect()[0]
    assert r.X == "HELLOWORLD"


def test_unsigned_binary_wraparound_is_null_not_negative():
    root = parse_copybook("01 R. 05 V PIC 9(18) COMP.")
    raw = (2 ** 63).to_bytes(8, "big") + (10 ** 18 - 1).to_bytes(8, "big")
    m = np.frombuffer(raw, np.uint8).reshape(2, 8)
    vals = decode_records(m, flatten(root))["r__v"]
    assert vals.isna()[0]  # out of precision -> null, never int64-min
    assert int(vals[1]) == 10 ** 18 - 1


def test_encode_trailing_p_negative_scale_exact():
    from kafka_connect_fs_spark.sources.copybook import encode_records

    root = parse_copybook("01 R. 05 V PIC 9(3)P(2).")
    f = root.children[0].children[0]
    assert f.pic.scale == -2 and f.size == 3
    raw = encode_records([{"v": 12300}], root)
    m = np.frombuffer(raw, np.uint8).reshape(1, 3)
    got = decode_records(m, flatten(root))["r__v"][0]
    assert float(got) == 12300.0  # 123 stored, x100 on decode


def test_usage_keyword_not_rewritten_inside_field_names():
    root = parse_copybook(
        "01 R. 05 PACKED-DECIMAL-FLAG PIC X. 05 COMPUTATIONAL-RATE PIC 9(3)."
    )
    names = [c.name for c in root.children[0].children]
    assert names == ["PACKED_DECIMAL_FLAG", "COMPUTATIONAL_RATE"]


# ------------------------------------------------- multiple / nested ODO

MULTI_ODO_CPY = (
    "01 R. 05 C1 PIC 9(2). "
    "05 A1 OCCURS 0 TO 5 DEPENDING ON C1 PIC 9(3). "
    "05 MID PIC X(2). "
    "05 C2 PIC 9(2). "
    "05 A2 OCCURS 0 TO 4 DEPENDING ON C2 PIC X(2). "
    "05 TAIL PIC X(3)."
)


def _multi_rec(a1: list[int], a2: list[str], mid: str, tail: str) -> bytes:
    s = (
        f"{len(a1):02d}" + "".join(f"{v:03d}" for v in a1)
        + mid
        + f"{len(a2):02d}" + "".join(a2)
        + tail
    )
    return s.encode("cp037")


def test_read_cobol_multiple_odo_arrays(spark, tmp_path):
    """Two ODO arrays in one record: the second counter sits AFTER the
    first variable array, so its on-disk position shifts per record —
    framing and decode must both apply the cumulative compaction."""
    recs = [
        _multi_rec([111, 222], ["ab", "cd", "ef"], "M1", "T01"),
        _multi_rec([], ["zz"], "M2", "T02"),
        _multi_rec([5, 6, 7, 8, 9], [], "M3", "T03"),
        _multi_rec([42], ["qq", "rr", "ss", "tt"], "M4", "T04"),
    ]
    p = str(tmp_path / "multi.dt")
    with open(p, "wb") as f:
        f.write(b"".join(recs))
    opts = {"copybook_content": MULTI_ODO_CPY, "schema_policy": "collapse_root"}
    rows = read_cobol(spark, [item(p)], opts).orderBy("_src_offset").collect()
    assert len(rows) == 4
    assert rows[0].A1 == [111, 222] and rows[0].A2 == ["ab", "cd", "ef"]
    assert rows[0].MID == "M1" and rows[0].TAIL == "T01"
    assert rows[1].A1 == [] and rows[1].A2 == ["zz"] and rows[1].TAIL == "T02"
    assert rows[2].A1 == [5, 6, 7, 8, 9] and rows[2].A2 == []
    assert rows[3].A1 == [42] and rows[3].A2 == ["qq", "rr", "ss", "tt"]
    # offsets: each record's true on-disk length
    lens = [len(r) for r in recs]
    assert [r._src_offset for r in rows] == [0, lens[0], lens[0] + lens[1],
                                             lens[0] + lens[1] + lens[2]]
    # resume past record 2: only later records emit
    got = read_cobol(
        spark, [WorkItem(p, lens[0] + lens[1], os.path.getsize(p))], opts
    )
    assert sorted(r.TAIL for r in got.collect()) == ["T03", "T04"]


def test_read_cobol_odo_inside_group(spark, tmp_path):
    """ODO array nested in a (non-repeating) group: the group's extent
    varies; fields after the group shift left per record."""
    cpy = (
        "01 R. 05 HDR. 10 C PIC 9(2). "
        "05 GRP. 10 A OCCURS 0 TO 3 DEPENDING ON C PIC X(2). "
        "05 TAIL PIC X(2)."
    )
    recs = [
        ("02" + "xy" + "zw" + "T1").encode("cp037"),
        ("00" + "T2").encode("cp037"),
        ("03" + "aabbcc" + "T3").encode("cp037"),
    ]
    p = str(tmp_path / "grp.dt")
    with open(p, "wb") as f:
        f.write(b"".join(recs))
    rows = (
        read_cobol(spark, [item(p)],
                   {"copybook_content": cpy, "schema_policy": "collapse_root"})
        .orderBy("_src_offset").collect()
    )
    assert [r.TAIL for r in rows] == ["T1", "T2", "T3"]
    assert rows[0].GRP.A == ["xy", "zw"]
    assert rows[1].GRP.A == []
    assert rows[2].GRP.A == ["aa", "bb", "cc"]


def test_find_odos_ambiguous_counter_raises():
    """ADVICE r4: duplicate item names for a DEPENDING ON counter (legal
    in COBOL with qualification) must raise, not bind first-seen."""
    from kafka_connect_fs_spark.sources.copybook import find_odos

    cpy = (
        "01 R. 05 G1. 10 N PIC 9(2). 05 G2. 10 N PIC 9(2). "
        "05 A OCCURS 1 TO 3 DEPENDING ON N PIC X."
    )
    with pytest.raises(CopybookError, match="ambiguous"):
        find_odos(parse_copybook(cpy))


def test_find_odos_odo_inside_repeating_group_raises():
    from kafka_connect_fs_spark.sources.copybook import find_odos

    cpy = (
        "01 R. 05 N PIC 9(2). 05 G OCCURS 2. "
        "10 A OCCURS 1 TO 3 DEPENDING ON N PIC X."
    )
    with pytest.raises(CopybookError, match="repeating group"):
        find_odos(parse_copybook(cpy))


def test_frame_odo_out_of_range_counter_stops_framing(spark, tmp_path, capfd):
    """ADVICE r4: a counter outside [occurs_min, occurs] means the
    stream is desynced — framing must stop at that record (emitting the
    good prefix) and warn, not clamp and silently decode garbage."""
    recs = [
        _odo_record(2, [111, 222], "AB"),
        # counter 9 > max 4: desync point
        (f"{9:02d}" + "999" + "XX").encode("cp037"),
        _odo_record(1, [333], "CD"),  # unreachable past the desync
    ]
    p = str(tmp_path / "bad.dt")
    with open(p, "wb") as f:
        f.write(b"".join(recs))
    opts = {"copybook_content": ODO_CPY, "schema_policy": "collapse_root"}
    rows = read_cobol(spark, [item(p)], opts).collect()
    assert [r.CNT for r in rows] == [2]  # only the pre-desync record


def test_frame_odo_on_desync_error_raises_loudly(spark, tmp_path):
    """ADVICE r5: with on_desync='error' the desync fails the read loudly
    (under the ingest engine: the batch fails and the operator sees the
    stuck file) instead of an executor stderr line while the remainder is
    silently skipped."""
    from pyspark.errors.exceptions.base import PySparkException

    recs = [
        _odo_record(2, [111, 222], "AB"),
        (f"{9:02d}" + "999" + "XX").encode("cp037"),  # counter 9 > max 4
    ]
    p = str(tmp_path / "bad2.dt")
    with open(p, "wb") as f:
        f.write(b"".join(recs))
    opts = {
        "copybook_content": ODO_CPY,
        "schema_policy": "collapse_root",
        "on_desync": "error",
    }
    with pytest.raises(PySparkException, match="ODO counter 9 outside"):
        read_cobol(spark, [item(p)], opts).collect()
    with pytest.raises(ValueError, match="on_desync"):
        read_cobol(spark, [item(p)], {"copybook_content": ODO_CPY,
                                      "on_desync": "bogus"})
