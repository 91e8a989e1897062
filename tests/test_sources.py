"""Source/sink connectors: round-trips, partition pruning, bucketed
shuffle-free joins (SURVEY.md §2.1 — the reference had one format; these
are the declared free upgrades)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from dbt_lab_spark.catalog import Catalog
from dbt_lab_spark.sources import (
    read_csv,
    read_json,
    write_bucketed_table,
    write_csv,
    write_json,
    write_partitioned,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_json_round_trip_matches_parquet(spark, sf_medium, tmp_path):
    cat = Catalog(sf_medium)
    nation = cat.table(spark, "nation")
    csv_path, json_path = str(tmp_path / "n_csv"), str(tmp_path / "n_json")
    write_csv(nation, csv_path)
    write_json(nation, json_path)
    schema = nation.schema
    assert _rows(read_csv(spark, csv_path, schema)) == _rows(nation)
    assert _rows(read_json(spark, json_path, schema)) == _rows(nation)


def test_orc_round_trip_and_pushdown(spark, sf_medium, tmp_path):
    """ORC round-trips exactly and pushes filters to the scan, same as
    parquet (the Hive/Trino-interop columnar format)."""
    from dbt_lab_spark.sources import read_orc, write_orc

    cat = Catalog(sf_medium)
    orders = cat.table(spark, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path, orders.schema)
    assert _rows(back) == _rows(orders)
    q = read_orc(spark, path).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = q._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "PushedFilters: [" in plan and "o_orderpriority" in plan, plan


def test_partitioned_write_prunes_partitions(spark, sf_medium, tmp_path):
    cat = Catalog(sf_medium)
    orders = cat.table(spark, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_partitioned(orders, path, ["o_year"])

    back = spark.read.parquet(path)
    q = back.filter(F.col("o_year") == 1997)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1][:200]
    want = orders.filter(F.col("o_year") == 1997).count()
    assert q.count() == want and want > 0


def test_bucketed_tables_join_without_shuffle(spark, sf_medium, tmp_path):
    """Equal bucketing on both join sides removes the exchange — the
    co-located fact-fact join.  (sortBy also removes SMJ sorts when
    buckets are single-file.)"""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    cat = Catalog(sf_medium)
    write_bucketed_table(
        cat.table(spark, "orders").select("o_orderkey", "o_totalprice"),
        "b_orders",
        ["o_orderkey"],
        num_buckets=8,
    )
    write_bucketed_table(
        cat.table(spark, "lineitem").select("l_orderkey", "l_quantity"),
        "b_lineitem",
        ["l_orderkey"],
        num_buckets=8,
    )
    # force SMJ (auto-broadcast would bypass bucketing on this small SF)
    j = spark.table("b_orders").hint("merge").join(
        spark.table("b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    # result parity against the plain path-based join
    want = (
        cat.table(spark, "orders")
        .join(cat.table(spark, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    assert j.count() == want


def test_write_sorted_narrows_row_group_stats(spark, sf_medium, tmp_path):
    """Sorted layout → narrow, mostly disjoint row-group min/max ranges
    (what makes parquet filter pushdown actually skip IO); unsorted
    layout → every row group spans ~the full range."""
    import pyarrow.parquet as pq
    import glob

    from dbt_lab_spark.operators.scan import scan
    from dbt_lab_spark.sources import write_sorted

    cat = Catalog(sf_medium)
    li = scan(spark, cat, "lineitem", ["l_orderkey", "l_extendedprice"]).repartition(4)

    def spans(root):
        out = []
        for f in glob.glob(f"{root}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            # tiny row groups: force several per file for the stats check
            for i in range(md.num_row_groups):
                col = md.row_group(i).column(0)  # l_orderkey
                out.append(col.statistics.max - col.statistics.min)
        return out

    unsorted_path, sorted_path = str(tmp_path / "u"), str(tmp_path / "s")
    # small parquet blocks → several row groups per file for the check
    block = str(64 * 1024)
    li.write.mode("overwrite").option("parquet.block.size", block).parquet(unsorted_path)
    write_sorted(li, sorted_path, ["l_orderkey"], **{"parquet.block.size": block})

    full_range = (
        li.agg(F.max("l_orderkey") - F.min("l_orderkey")).collect()[0][0]
    )
    u_spans, s_spans = spans(unsorted_path), spans(sorted_path)
    assert len(u_spans) >= 4 and len(s_spans) >= 4
    avg_u = sum(u_spans) / len(u_spans)
    avg_s = sum(s_spans) / len(s_spans)
    # unsorted row groups span nearly everything; sorted ones are narrow
    assert avg_u > 0.5 * full_range, (avg_u, full_range)
    assert avg_s < 0.5 * avg_u, (avg_s, avg_u)


def test_zordered_layout_narrows_stats_on_both_columns(spark, sf_medium, tmp_path):
    """Z-order clustering on (l_partkey, l_suppkey): row-group min/max
    ranges shrink on BOTH columns, where a lexicographic sort narrows
    only its leading column — the property that lets a filter on
    EITHER column skip row groups at scan time."""
    import glob

    import pyarrow.parquet as pq

    from dbt_lab_spark.operators.scan import scan
    from dbt_lab_spark.sources import write_sorted, write_zordered

    cat = Catalog(sf_medium)
    li = scan(spark, cat, "lineitem", ["l_partkey", "l_suppkey"]).repartition(4)

    def avg_spans(root):
        spans = {0: [], 1: []}
        for f in glob.glob(f"{root}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for i in range(md.num_row_groups):
                for ci in (0, 1):
                    st = md.row_group(i).column(ci).statistics
                    spans[ci].append(st.max - st.min)
        assert len(spans[0]) >= 8
        return [sum(v) / len(v) for v in spans.values()]

    block = str(32 * 1024)
    lex_path, z_path = str(tmp_path / "lex"), str(tmp_path / "z")
    write_sorted(li, lex_path, ["l_partkey", "l_suppkey"], **{"parquet.block.size": block})
    write_zordered(li, z_path, ["l_partkey", "l_suppkey"], num_files=4,
                   **{"parquet.block.size": block})

    full = li.agg(
        F.max("l_partkey") - F.min("l_partkey"), F.max("l_suppkey") - F.min("l_suppkey")
    ).collect()[0]
    lex, zo = avg_spans(lex_path), avg_spans(z_path)
    # lexicographic: leading column narrow, second column ~full range
    assert lex[0] < 0.2 * full[0], (lex, full)
    assert lex[1] > 0.5 * full[1], (lex, full)
    # z-order: BOTH columns substantially narrowed
    assert zo[0] < 0.5 * full[0], (zo, full)
    assert zo[1] < 0.5 * full[1], (zo, full)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_medium, tmp_path):
    """A join against a filtered dimension must plant a runtime
    dynamicpruning expression in the partitioned fact scan's
    PartitionFilters — whole directories are skipped based on the
    dim filter's RESULT, not just static predicates.  The static
    directory-pruning case is covered by
    test_partitioned_write_prunes_partitions; this is the join-driven
    variant that matters for star schemas at scale."""
    from dbt_lab_spark.sources import write_partitioned

    fact_path = str(tmp_path / "fact")
    orders = spark.read.parquet(f"{sf_medium}/orders.parquet")
    write_partitioned(orders, fact_path, ["o_orderpriority"])
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("1-URGENT", "u"), ("2-HIGH", "h"), ("3-MEDIUM", "m"),
         ("4-NOT SPECIFIED", "n"), ("5-LOW", "l")],
        ["prio", "tag"],
    ).filter(F.col("tag") == "u")
    j = fact.join(dim, fact.o_orderpriority == dim.prio).groupBy("prio").agg(
        F.count("*").alias("n")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "dynamicpruningexpression" in plan, plan
    # and the result is correct: only the URGENT partition contributes
    [(prio, n)] = [(r["prio"], r["n"]) for r in j.collect()]
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert (prio, n) == ("1-URGENT", want)


def test_read_media_dir_binaryfile_ingestion(spark, tmp_path):
    """binaryFile ingestion: a directory of real encoded media files
    loads into the asset shape with magic-sniffed media types, glob
    and size pushdown work, and the payloads decode end-to-end through
    the real codec path."""
    import numpy as np

    from dbt_lab_spark.llm import codecs
    from dbt_lab_spark.sources import read_media_dir

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    (tmp_path / "a.jpg").write_bytes(codecs.encode_jpeg(img))
    (tmp_path / "b.png").write_bytes(codecs.encode_png(img))
    (tmp_path / "c.wav").write_bytes(
        codecs.encode_wav(rng.integers(-1000, 1000, size=400, dtype=np.int16))
    )
    (tmp_path / "junk.txt").write_bytes(b"not a media file")

    assets = read_media_dir(spark, str(tmp_path))
    rows = assets.collect()
    types = sorted(r["media_type"] for r in rows)
    assert types == ["audio", "image", "image", "unknown"]
    assert len({r["asset_id"] for r in rows}) == 4  # distinct stable ids

    # media-only + decode end-to-end: every payload featurizes
    media = assets.filter(assets.media_type != "unknown")
    feats = [
        codecs.decode_payload(bytes(r["payload"])) for r in media.collect()
    ]
    assert all(len(f) == 8 and abs(sum(f) - 1.0) < 1e-9 for f in feats)

    # pushdown: glob filter and size cap
    assert read_media_dir(spark, str(tmp_path), glob="*.png").count() == 1
    small = read_media_dir(spark, str(tmp_path), max_bytes=50).count()
    assert small >= 1  # the txt file at least


# ---------------------------------------------------------------------------
# WARC (ISO 28500)
# ---------------------------------------------------------------------------


def test_warc_record_framing_pinned():
    from dbt_lab_spark.sources import warc_record_bytes

    rec = warc_record_bytes("response", "https://x.example/a/1", b"hello")
    text = rec.decode()
    assert text.startswith("WARC/1.0\r\n")
    assert "WARC-Target-URI: https://x.example/a/1\r\n" in text
    assert "Content-Length: 5\r\n" in text
    assert rec.endswith(b"\r\n\r\nhello\r\n\r\n")
    # deterministic: same inputs -> identical bytes (record id is md5-derived)
    assert rec == warc_record_bytes("response", "https://x.example/a/1", b"hello")


def test_warc_build_parse_round_trip(spark):
    from dbt_lab_spark.sources import build_warc_shards, parse_warc

    docs = spark.createDataFrame(
        [(i, f"document body {i} " + "x" * (i % 13), "web" if i % 2 else "books")
         for i in range(37)],
        "doc_id long, text string, source string",
    )
    shards = build_warc_shards(docs, n_shards=4)
    srows = shards.collect()
    assert len(srows) == 4
    assert sum(r["n_records"] for r in srows) == 37
    records = parse_warc(shards).collect()
    assert len(records) == 37
    by_uri = {r["target_uri"]: r for r in records}
    for i in range(37):
        src = "web" if i % 2 else "books"
        r = by_uri[f"https://corpus.example/{src}/{i}"]
        body = f"document body {i} " + "x" * (i % 13)
        assert bytes(r["payload"]).decode() == body
        assert r["content_length"] == len(body.encode())
        assert r["record_type"] == "response"


def test_warc_parse_rejects_malformed(spark):
    from dbt_lab_spark.sources import parse_warc, warc_record_bytes

    good = warc_record_bytes("response", "https://x/1", b"abc")
    bad = good[:-2]  # drop part of the record terminator
    blobs = spark.createDataFrame([(bad,)], "warc binary")
    with pytest.raises(Exception, match="WARC|terminator"):
        parse_warc(blobs).collect()


def test_warc_shards_deterministic_under_repartition(spark):
    from dbt_lab_spark.sources import build_warc_shards

    docs = spark.createDataFrame(
        [(i, f"t{i}", "s") for i in range(20)],
        "doc_id long, text string, source string",
    )
    a = {r["shard_id"]: bytes(r["warc"]) for r in build_warc_shards(docs, 3).collect()}
    b = {
        r["shard_id"]: bytes(r["warc"])
        for r in build_warc_shards(docs.repartition(7), 3).collect()
    }
    assert a == b  # doc_id-sorted records make shard bytes stable


# ---------------------------------------------------------------------------
# WebDataset tar shards (POSIX ustar)
# ---------------------------------------------------------------------------


def test_tar_round_trip_and_stdlib_interop():
    import io
    import tarfile

    from dbt_lab_spark.sources import tar_bytes, untar_bytes

    members = [
        ("00000001.txt", b"hello world"),
        ("00000001.json", b'{"a": 1}'),
        ("block.bin", bytes(range(256)) * 3),  # exercises 512-padding
        ("empty.txt", b""),
    ]
    blob = tar_bytes(members)
    assert untar_bytes(blob) == members
    assert len(blob) % 512 == 0
    # conforming consumer: stdlib tarfile reads our archive
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    assert [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()] == members
    # conforming producer: our parser reads stdlib's ustar output
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        for n, p in members:
            ti = tarfile.TarInfo(n)
            ti.size = len(p)
            w.addfile(ti, io.BytesIO(p))
    assert untar_bytes(buf.getvalue()) == members
    # deterministic bytes (metadata pinned)
    assert blob == tar_bytes(members)


def test_tar_checksum_verified():
    from dbt_lab_spark.sources import tar_bytes, untar_bytes

    blob = bytearray(tar_bytes([("f.txt", b"data")]))
    blob[0] ^= 0xFF  # corrupt the name field
    with pytest.raises(ValueError, match="checksum"):
        untar_bytes(bytes(blob))


def test_webdataset_shards_round_trip(spark):
    from dbt_lab_spark.sources import build_webdataset_shards, read_webdataset

    docs = spark.createDataFrame(
        [(i, f"text body {i}", f"s{i % 3}") for i in range(25)],
        "doc_id long, text string, source string",
    )
    shards = build_webdataset_shards(docs, n_shards=4)
    srows = shards.collect()
    assert sum(r["n_samples"] for r in srows) == 25
    members = read_webdataset(shards).collect()
    assert len(members) == 50  # .txt + .json per sample
    txt = {r["key"]: bytes(r["payload"]) for r in members if r["ext"] == "txt"}
    js = {r["key"]: bytes(r["payload"]) for r in members if r["ext"] == "json"}
    import json as _json

    for i in range(25):
        key = f"{i:08d}"
        assert txt[key].decode() == f"text body {i}"
        assert _json.loads(js[key]) == {"doc_id": i, "source": f"s{i % 3}"}


def test_warc_gz_multimember_round_trip(spark):
    """compress=True emits one gzip member per record (the CommonCrawl
    .warc.gz framing); parse_warc inflates transparently and yields the
    identical records as the uncompressed path."""
    from dbt_lab_spark.sources import build_warc_shards, parse_warc

    docs = spark.createDataFrame(
        [(i, f"body {i} " + "y" * (i % 9), "web") for i in range(23)],
        "doc_id long, text string, source string",
    )
    plain = parse_warc(build_warc_shards(docs, 3)).collect()
    gz_shards = build_warc_shards(docs, 3, compress=True)
    gz = parse_warc(gz_shards).collect()
    key = lambda r: (r["target_uri"], r["content_length"], bytes(r["payload"]))
    assert sorted(map(key, gz)) == sorted(map(key, plain))
    # compressed blobs really are multi-member gzip and smaller-framed
    blob = bytes(gz_shards.collect()[0]["warc"])
    assert blob[:2] == b"\x1f\x8b"
    assert blob.count(b"\x1f\x8b\x08") >= 2  # several members
    # determinism (mtime pinned)
    blob2 = bytes(build_warc_shards(docs, 3, compress=True).collect()[0]["warc"])
    assert blob == blob2


def test_parquet_rowgroup_stats_matches_duckdb_metadata(spark, sf_medium, tmp_path):
    """Footer stats read distributed must equal DuckDB's
    parquet_metadata() for the same file — and a multi-row-group file
    yields one row per (row group, column)."""
    import duckdb

    from dbt_lab_spark.operators.scan import scan
    from dbt_lab_spark.sources import parquet_rowgroup_stats

    cat = Catalog(sf_medium)
    # several small row groups so the per-rg fan-out is exercised
    path = str(tmp_path / "li")
    scan(spark, cat, "lineitem", ["l_orderkey", "l_quantity"]).coalesce(1).write.option(
        "parquet.block.size", str(64 * 1024)
    ).parquet(path)
    got = parquet_rowgroup_stats(spark, path).filter(F.col("column") == "l_orderkey")
    rows = {(r["file"], r["row_group"]): r for r in got.collect()}
    assert len(rows) >= 2  # multiple row groups
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT file_name, row_group_id, num_values, stats_null_count,
                   stats_min_value, stats_max_value
            FROM parquet_metadata('{path}/*.parquet')
            WHERE path_in_schema = 'l_orderkey'"""
    ).fetchall()
    assert len(want) == len(rows)
    for fname, rg, nv, nulls, mn, mx in want:
        r = rows[(fname, rg)]
        assert r["num_values"] == nv
        assert r["null_count"] == nulls
        assert int(r["min_value"]) == int(mn)
        assert int(r["max_value"]) == int(mx)


def test_parquet_stats_footer_faithful_to_data(spark, sf_medium):
    """Footer min/max/null totals equal data aggregates — the invariant
    row-group pruning relies on (this is q_parquet_stats' oracle)."""
    from dbt_lab_spark.sources import parquet_rowgroup_stats

    stats = parquet_rowgroup_stats(spark, f"{sf_medium}/orders.parquet")
    got = {
        r["column"]: r
        for r in stats.filter(F.col("column") == "o_orderkey")
        .groupBy("column")
        .agg(
            F.sum("num_rows").alias("rows"),
            F.min(F.col("min_value").cast("long")).alias("mn"),
            F.max(F.col("max_value").cast("long")).alias("mx"),
        )
        .collect()
    }
    orders = Catalog(sf_medium).table(spark, "orders")
    want = orders.agg(
        F.count("*"), F.min("o_orderkey"), F.max("o_orderkey")
    ).first()
    r = got["o_orderkey"]
    assert (r["rows"], r["mn"], r["mx"]) == tuple(want)


def test_warc_files_ingest_via_binaryfile(spark, tmp_path):
    """End-to-end file-layout ingestion: shard blobs written as
    .warc.gz FILES, listed+loaded by Spark's binaryFile source, parsed
    by parse_warc — the exact CommonCrawl-on-disk path."""
    from dbt_lab_spark.sources import build_warc_shards, parse_warc

    docs = spark.createDataFrame(
        [(i, f"payload {i}", "web") for i in range(30)],
        "doc_id long, text string, source string",
    )
    shards = build_warc_shards(docs, n_shards=3, compress=True).collect()
    for r in shards:
        (tmp_path / f"shard-{r['shard_id']:03d}.warc.gz").write_bytes(bytes(r["warc"]))

    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(str(tmp_path))
        .select(F.col("content").alias("warc"))
    )
    records = parse_warc(blobs).collect()
    assert len(records) == 30
    assert sorted(bytes(r["payload"]).decode() for r in records) == sorted(
        f"payload {i}" for i in range(30)
    )
    assert all(r["record_type"] == "response" for r in records)


def test_read_parquet_evolved_merges_late_columns(spark, tmp_path):
    from dbt_lab_spark.sources import read_parquet_evolved

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v1 string").write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v1 string, v2 double"
    ).write.mode("append").parquet(path)
    df = read_parquet_evolved(spark, path)
    assert set(df.columns) == {"id", "v1", "v2"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["v2"] is None and rows[2]["v2"] == 9.5


def test_zip_shards_round_trip_and_corruption(spark):
    import zipfile

    from dbt_lab_spark.sources import read_zip_shards, unzip_bytes, zip_bytes

    members = [("00000001.txt", b"hello"), ("00000001.json", b"{}"), ("x.bin", bytes(300))]
    blob = zip_bytes(members)
    assert unzip_bytes(blob) == members
    assert blob == zip_bytes(members)  # byte-deterministic
    blobs = spark.createDataFrame([(0, blob)], "shard_id int, zip binary")
    rows = read_zip_shards(blobs).collect()
    assert sorted((r["key"], r["ext"]) for r in rows) == [
        ("00000001", "json"), ("00000001", "txt"), ("x", "bin"),
    ]
    # CRC catches member corruption
    bad = bytearray(blob)
    bad[blob.index(b"hello")] ^= 0xFF
    blobs_bad = spark.createDataFrame([(0, bytes(bad))], "shard_id int, zip binary")
    import pytest as _pytest

    with _pytest.raises(Exception, match="CRC|Bad"):
        read_zip_shards(blobs_bad).collect()


class TestAvro:
    def test_round_trip_all_types(self):
        from dbt_lab_spark.sources import avro_file_bytes, parse_avro_bytes

        fields = [
            ("a", "long"), ("b", "string"), ("c", "double"), ("d", "boolean"),
            ("e", "bytes"), ("f", ["null", "string"]), ("g", ["null", "long"]),
        ]
        recs = [
            {"a": 0, "b": "", "c": 0.0, "d": False, "e": b"", "f": None, "g": None},
            {"a": -1, "b": "x", "c": -1.5, "d": True, "e": b"\x00\xff", "f": "y", "g": 9},
            {"a": 2**40, "b": "ünïcødé", "c": 1e300, "d": False, "e": b"abc", "f": None, "g": -7},
        ]
        for codec in ("null", "deflate"):
            _, out = parse_avro_bytes(avro_file_bytes(recs, fields, codec=codec))
            assert out == recs

    def test_byte_determinism(self):
        from dbt_lab_spark.sources import avro_file_bytes

        recs = [{"a": i} for i in range(100)]
        one = avro_file_bytes(recs, [("a", "long")])
        assert one == avro_file_bytes(recs, [("a", "long")])

    def test_corruption_rejected(self):
        import pytest as _pytest

        from dbt_lab_spark.sources import avro_file_bytes, parse_avro_bytes

        blob = avro_file_bytes([{"a": 1}], [("a", "long")])
        with _pytest.raises(ValueError, match="sync marker"):
            parse_avro_bytes(blob[:-1] + bytes([blob[-1] ^ 0xFF]))
        with _pytest.raises(ValueError, match="magic"):
            parse_avro_bytes(b"NOPE" + blob[4:])

    def test_zigzag_varint_pins(self):
        # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04
        from dbt_lab_spark.sources import _avro_zigzag

        assert [_avro_zigzag(n) for n in (0, -1, 1, -2, 2)] == [
            b"\x00", b"\x01", b"\x02", b"\x03", b"\x04"
        ]
        assert _avro_zigzag(64) == b"\x80\x01"  # two-byte varint boundary

    def test_property_random_records(self):
        import random

        from dbt_lab_spark.sources import avro_file_bytes, parse_avro_bytes

        rng = random.Random(42)
        fields = [("i", "long"), ("s", ["null", "string"]), ("x", "double"), ("bl", "boolean")]
        for _ in range(25):
            recs = [
                {
                    "i": rng.randint(-(2**62), 2**62),
                    "s": None if rng.random() < 0.3 else "".join(
                        chr(rng.randint(32, 0x2FF)) for _ in range(rng.randint(0, 40))
                    ),
                    "x": rng.uniform(-1e18, 1e18),
                    "bl": rng.random() < 0.5,
                }
                for _ in range(rng.randint(0, 30))
            ]
            codec = rng.choice(["null", "deflate"])
            _, out = parse_avro_bytes(avro_file_bytes(recs, fields, codec=codec))
            assert out == recs

    def test_spark_shard_round_trip(self, spark):
        from pyspark.sql import functions as F

        from dbt_lab_spark.sources import build_avro_shards, read_avro_docs

        docs = spark.createDataFrame(
            [(i, f"doc text {i}", "en" if i % 2 else None, f"src{i % 3}", 10 + i)
             for i in range(57)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        shards = build_avro_shards(docs, n_shards=4, codec="deflate")
        assert shards.agg(F.sum("n_records")).first()[0] == 57
        back = read_avro_docs(shards).drop("shard_id")
        want = sorted(map(tuple, docs.collect()))
        got = sorted(map(tuple, back.collect()))
        assert got == want

    def test_negative_metadata_block_count(self):
        """Spec: a negative map/array block count is followed by a
        byte size and means abs(count) items — some writers emit this
        form; the reader must accept it."""
        import json

        from dbt_lab_spark.sources import (
            _AVRO_MAGIC,
            _avro_zigzag,
            parse_avro_bytes,
        )

        schema = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
        sj = json.dumps(schema, sort_keys=True).encode()
        sync = b"S" * 16
        out = bytearray(_AVRO_MAGIC)
        items = bytearray()
        for k, v in [(b"avro.schema", sj), (b"avro.codec", b"null")]:
            items += _avro_zigzag(len(k)) + k + _avro_zigzag(len(v)) + v
        out += _avro_zigzag(-2) + _avro_zigzag(len(items)) + items + _avro_zigzag(0)
        out += sync
        rec = _avro_zigzag(7)
        out += _avro_zigzag(1) + _avro_zigzag(len(rec)) + rec + sync
        names, recs = parse_avro_bytes(bytes(out))
        assert names == ["a"] and recs == [{"a": 7}]


def test_npy_bytes_numpy_interop():
    """Our .npy writer/parser interoperate bit-exactly with NumPy's own
    save/load in both directions, for the dtypes the shard path uses."""
    import io

    import numpy as np

    from dbt_lab_spark.sources import npy_bytes, parse_npy_bytes

    for arr in (
        np.arange(12, dtype="<f4").reshape(3, 4),
        np.arange(7, dtype="<i8"),
        np.array([], dtype="<f8"),
    ):
        assert (parse_npy_bytes(npy_bytes(arr)) == arr).all()
        buf = io.BytesIO()
        np.save(buf, arr)
        assert (parse_npy_bytes(buf.getvalue()) == arr).all()
        assert (np.load(io.BytesIO(npy_bytes(arr))) == arr).all()


def test_safetensors_roundtrip_and_header_shape():
    import json
    import struct

    import numpy as np

    from dbt_lab_spark.sources import parse_safetensors_bytes, safetensors_bytes

    ids = np.arange(5, dtype="<i8")
    mat = np.arange(20, dtype="<f4").reshape(5, 4)
    blob = safetensors_bytes({"ids": ids, "embeddings": mat})
    (hlen,) = struct.unpack("<Q", blob[:8])
    table = json.loads(blob[8 : 8 + hlen])
    assert table["embeddings"]["dtype"] == "F32"
    assert table["embeddings"]["shape"] == [5, 4]
    assert table["ids"]["dtype"] == "I64"
    out = parse_safetensors_bytes(blob)
    assert (out["ids"] == ids).all() and (out["embeddings"] == mat).all()


def test_vector_shard_roundtrip_exact(spark):
    """Shard -> parse returns the exact float32 vectors and ids for
    both formats."""
    import numpy as np

    from dbt_lab_spark.sources import (
        build_npy_shards,
        build_safetensors_shards,
        read_npy_vectors,
        read_safetensors_vectors,
    )

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=8).astype("float32")]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    want = {i: v for i, v in rows}
    for build, read in (
        (build_npy_shards, read_npy_vectors),
        (build_safetensors_shards, read_safetensors_vectors),
    ):
        got = {
            r.vec_id: list(r.embedding)
            for r in read(build(df, n_shards=4)).collect()
        }
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == [np.float32(x) for x in want[k]]
