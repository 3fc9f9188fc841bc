"""Custom Python DataSource (length-prefixed record archive): framing
round-trip, per-file partition planning, and the opaque-binary handoff
into the multimodal feature pipeline."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from columnar_analytics_engine_spark.sources.record_archive import (
    RecordArchiveDataSource,
    read_records,
    write_record_archive,
)


@pytest.fixture()
def archive_dir(tmp_path):
    payloads_a = [b"alpha", b"", b"\xff\xd8binary-bytes\x00\x01", "unicode κ 日本".encode()]
    payloads_b = [b"beta-record"]
    write_record_archive(str(tmp_path / "shard-0.lprec"), payloads_a)
    write_record_archive(str(tmp_path / "shard-1.lprec"), payloads_b)
    (tmp_path / "ignored.txt").write_text("not an archive")
    return str(tmp_path), payloads_a + payloads_b


def test_python_framing_roundtrip(archive_dir):
    path, payloads = archive_dir
    got = [p for _off, p in read_records(os.path.join(path, "shard-0.lprec"))]
    assert got == payloads[:4]
    # offsets advance by 4 + len
    offs = [o for o, _p in read_records(os.path.join(path, "shard-0.lprec"))]
    assert offs == [0, 9, 13, 33]


def test_truncated_archive_raises(tmp_path):
    p = str(tmp_path / "bad.lprec")
    write_record_archive(p, [b"good"])
    with open(p, "ab") as fh:
        fh.write(b"\x00\x00\x00\xff")  # length prefix promising 255 bytes
    with pytest.raises(EOFError):
        list(read_records(p))


def test_datasource_reads_all_shards(spark, archive_dir):
    path, payloads = archive_dir
    spark.dataSource.register(RecordArchiveDataSource)
    df = spark.read.format("recordarchive").load(path)
    assert df.columns == ["file", "offset", "n_bytes", "payload"]
    rows = df.collect()
    assert sorted(bytes(r["payload"]) for r in rows) == sorted(payloads)
    # one partition per shard file — the scaling contract
    assert df.rdd.getNumPartitions() == 2
    # non-archive files are not picked up
    assert all(r["file"].endswith(".lprec") for r in rows)
    assert all(r["n_bytes"] == len(bytes(r["payload"])) for r in rows)


def test_datasource_write_read_roundtrip(spark, tmp_path):
    """Spark-side sink: one shard per partition, atomic rename, byte
    round-trip through the reader."""
    spark.dataSource.register(RecordArchiveDataSource)
    payloads = [bytes([i]) * (i + 1) for i in range(10)]
    df = spark.createDataFrame([(p,) for p in payloads], "payload binary").repartition(3)
    out = str(tmp_path / "sink")
    df.write.format("recordarchive").mode("append").save(out)
    shards = [f for f in os.listdir(out) if f.endswith(".lprec")]
    assert len(shards) == 3
    assert not any(".tmp-" in f for f in os.listdir(out))
    back = spark.read.format("recordarchive").load(out)
    assert sorted(bytes(r["payload"]) for r in back.collect()) == sorted(payloads)


def test_datasource_feeds_multimodal_pipeline(spark, archive_dir):
    """Archive payloads flow straight into the binary-column pipeline:
    sniff image headers on the raw bytes without any decode."""
    from columnar_analytics_engine_spark.operators.multimodal import image_dimensions

    path, _payloads = archive_dir
    spark.dataSource.register(RecordArchiveDataSource)
    media = (
        spark.read.format("recordarchive")
        .load(path)
        .select(F.col("offset").alias("doc_id"), "payload")
    )
    out = image_dimensions(media)
    # the \xff\xd8 payload sniffs as jpeg (no SOF -> null dims), others null
    fmts = {bytes(r["payload"])[:2]: r["img_format"] for r in out.collect()}
    assert fmts[b"\xff\xd8"] == "jpeg"
    assert fmts.get(b"al") is None


def test_streaming_reader_picks_up_new_shards_exactly_once(spark, tmp_path):
    """readStream over an append-only shard directory: a restart from
    the checkpoint ingests only shards that appeared since — the
    exactly-once live-crawl-drop contract."""
    import os

    from columnar_analytics_engine_spark.sources.record_archive import (
        MAGIC_SUFFIX,
        RecordArchiveDataSource,
        write_record_archive,
    )

    spark.dataSource.register(RecordArchiveDataSource)
    src = str(tmp_path / "drops")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    write_record_archive(f"{src}/a{MAGIC_SUFFIX}", [b"r1", b"r2"])
    write_record_archive(f"{src}/b{MAGIC_SUFFIX}", [b"r3"])

    def drain():
        q = (
            spark.readStream.format("recordarchive")
            .load(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = {bytes(r.payload) for r in spark.read.parquet(out).collect()}
    assert first == {b"r1", b"r2", b"r3"}

    # a new drop lands; resuming from the checkpoint ingests ONLY it
    write_record_archive(f"{src}/c{MAGIC_SUFFIX}", [b"r4", b"r5"])
    drain()
    rows = spark.read.parquet(out).collect()
    assert {bytes(r.payload) for r in rows} == {b"r1", b"r2", b"r3", b"r4", b"r5"}
    assert len(rows) == 5  # no re-ingestion of a/b on restart
