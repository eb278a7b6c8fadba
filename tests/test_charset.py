"""C1 charset transcode: Oracle charset names through JVM decoders."""

import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.functions.charset import (
    decode_text,
    resolve_charset,
    transcode,
    transcode_columns,
)


def test_name_resolution():
    assert resolve_charset("AL32UTF8") == "UTF-8"
    assert resolve_charset("we8iso8859p1") == "ISO-8859-1"
    assert resolve_charset("JA16SJIS") == "Shift_JIS"
    assert resolve_charset("UTF-16LE") == "UTF-16LE"  # raw passthrough
    with pytest.raises(ValueError):
        resolve_charset("XX9NOPE")
    with pytest.raises(ValueError):
        resolve_charset("ZHT32EUC")  # EUC-TW: no stdlib codec, rejected


def test_decode_8bit_and_utf16(spark):
    rows = [
        (1, "WE8ISO8859P1", "héllo wörld".encode("iso-8859-1")),
        (2, "AL16UTF16", "héllo wörld".encode("utf-16-be")),
        (3, "WE8MSWIN1252", "curly ’quote’".encode("windows-1252")),
        (4, "JA16SJIS", "日本語テキスト".encode("shift_jis")),
    ]
    df = spark.createDataFrame(rows, "id int, cs string, payload binary")
    got = {}
    for cs in {r[1] for r in rows}:
        part = df.where(F.col("cs") == cs).select(
            "id", decode_text(F.col("payload"), cs).alias("t"))
        got.update({r["id"]: r["t"] for r in part.collect()})
    assert got[1] == "héllo wörld"
    assert got[2] == "héllo wörld"
    assert got[3] == "curly ’quote’"
    assert got[4] == "日本語テキスト"


def test_name_resolution_cjk_round4():
    """Round-4 additions: GB18030 + HKSCS map to stdlib codecs; the
    reference sets with no stdlib codec stay refused."""
    assert resolve_charset("ZHS32GB18030") == "gb18030"
    assert resolve_charset("zht16hkscs31") == "big5hkscs"
    assert resolve_charset("ZHT16HKSCS") == "big5hkscs"
    for refused in ("KO16KSCCS", "ZHT32EUC", "ZHT32TRIS"):
        with pytest.raises(ValueError):
            resolve_charset(refused)


def test_decode_gb18030_and_hkscs_roundtrip(spark):
    """GB18030 4-byte sequences (chars beyond GBK) and an HKSCS extension
    char survive decode + transcode to UTF-8."""
    s_gb = "汉字𠀋ẞ€"        # 𠀋 needs a GB18030 4-byte sequence
    s_hk = "香港字：嘅咗𥄫"  # 嘅/咗/𥄫 are HKSCS-only (not plain Big5)
    df = spark.createDataFrame(
        [(s_gb.encode("gb18030"), s_hk.encode("big5hkscs"))],
        "g binary, h binary",
    )
    out = transcode_columns(
        df, {"g": "ZHS32GB18030", "h": "ZHT16HKSCS31"}).first()
    assert out["g"] == s_gb
    assert out["h"] == s_hk


def test_transcode_roundtrip_to_utf8(spark):
    src = "ÄÖÜ äöü ß €".encode("windows-1252")
    df = spark.createDataFrame([(src,)], "b binary")
    out = df.select(transcode(F.col("b"), "WE8MSWIN1252").alias("u"))
    raw = bytes(out.first()["u"])
    assert raw.decode("utf-8") == "ÄÖÜ äöü ß €"


def test_transcode_columns_per_column_map(spark):
    df = spark.createDataFrame(
        [(1, "naïve".encode("iso-8859-1"), "καλημέρα".encode("iso-8859-7"))],
        "id int, a binary, g binary",
    )
    out = transcode_columns(
        df, {"a": "WE8ISO8859P1", "g": "EL8ISO8859P7"}).first()
    assert out["a"] == "naïve"
    assert out["g"] == "καλημέρα"


def test_transcode_is_map_only(spark):
    df = spark.createDataFrame([(b"x",)], "b binary")
    # core set: pure JVM codegen, no Python stage
    plan = (
        df.select(transcode(F.col("b"), "US7ASCII", "AL32UTF8"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
    # extended set: Arrow kernel allowed, but still no shuffle
    plan = (
        df.select(transcode(F.col("b"), "WE8MSWIN1252"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
