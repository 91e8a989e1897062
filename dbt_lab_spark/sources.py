"""Sources & sinks beyond the reference's single table format.

The reference reads exactly one format (.mdtbl,
io/tables/TableResourceManager.java:36,653-700) and one index format
(.mdidx).  Parquet is this engine's canonical storage (BASELINE.json);
this module adds the free Spark upgrades:

  read_csv / read_json     declared-schema connectors (never inferSchema
                           — the engine's catalogue-driven posture,
                           catalogue/TableSchema.java:20)
  write_csv / write_json   interchange sinks
  write_partitioned        hive-style partitioned parquet — partition
                           pruning on the partition key is the Spark
                           analogue of the reference's index range scan
                           (qexec/IndexScanOperator.java:17): predicates
                           on the key skip whole directories
  write_bucketed_table     bucketBy sink: pre-shuffled storage so equal
                           bucketing on both sides of a join removes the
                           shuffle entirely (the 100 TB fact-fact join
                           answer; asserted shuffle-free in tests)
"""

from __future__ import annotations

from dbt_lab_spark.localrel import local_df

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV source with a declared schema (no inference pass — one read,
    stable types)."""
    return spark.read.schema(schema).option("header", header).option("sep", sep).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines source with a declared schema."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC source (columnar, predicate-pushdown-capable like parquet).
    Schema optional: ORC footers carry exact types, but a declared
    schema enforces the catalog contract just as the parquet path does."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — same pushdown/pruning properties as parquet; useful
    for interop with Hive/Trino estates that standardize on ORC."""
    df.write.mode(mode).orc(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Hive-partitioned parquet sink.  Reads back with
    `spark.read.parquet(path)`; filters on the partition columns prune
    directories before any I/O (PartitionFilters in the scan node)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) table in the session catalog.

    Two tables bucketed the same way join WITHOUT a shuffle — the
    storage-level answer to repeated fact-fact joins; with sort_cols the
    sort-merge join also skips its sorts.  (File-path parquet cannot
    carry bucket metadata, hence saveAsTable.)
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_columns: list[str],
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write parquet with rows sorted WITHIN each file by
    `sort_columns` — the data-layout half of predicate pushdown.

    Parquet keeps min/max statistics per row group; on a randomly
    ordered file every row group spans the whole value range, so a
    selective filter prunes nothing.  Sorting within partitions makes
    the row-group ranges narrow and disjoint, so point/range filters
    skip most of the file at scan time (the poor man's clustered
    index — what Delta's OPTIMIZE ZORDER generalizes to multiple
    dimensions).  sortWithinPartitions is a per-partition local sort:
    no shuffle; combine with repartition(col) first if you also want
    range-disjoint FILES."""
    df.sortWithinPartitions(*sort_columns).write.mode(mode).options(**options).parquet(path)


def zorder_key(buckets: Sequence, bits: int = 8):
    """Interleave the bits of per-column bucket ids (each in
    [0, 2**bits)) into one Z-value Column — round-robin bit
    interleaving, so proximity in EVERY dimension maps to proximity in
    the sort key.  Pure integer shift/mask expressions: JVM-side,
    codegen, no UDF."""
    from pyspark.sql import functions as F

    ncols = len(buckets)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * ncols + j)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    columns: Sequence[str],
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Z-order-clustered parquet: the multi-dimensional generalization
    of `write_sorted` (what Delta's OPTIMIZE ZORDER does).

    A lexicographic sort narrows row-group min/max stats on the FIRST
    column only — a filter on the second column still reads the whole
    file.  Z-ordering buckets each column into 2**bits quantile-based
    ranks, interleaves the rank bits into one Z-value, and range
    partitions + locally sorts by it: row groups become small
    hyper-rectangles, so selective filters on ANY of the clustered
    columns skip most row groups.

    Quantile (not min/max-uniform) bucket boundaries make the curve
    robust to skew; the per-row bucket lookup is a counting scan of the
    <=2**bits boundary array (F.filter/size — cheap next to parquet
    decode, no shuffle beyond the final range partition)."""
    from pyspark.sql import functions as F

    nb = 2**bits
    probs = [i / nb for i in range(1, nb)]
    bucket_cols = []
    for c in columns:
        # deduped interior quantile boundaries (<= nb-1 of them)
        bounds = sorted(set(df.approxQuantile(c, probs, 0.001)))
        arr = F.array(*[F.lit(b) for b in bounds])
        bucket_cols.append(F.size(F.filter(arr, lambda b: b <= F.col(c).cast("double"))))
    z = df.withColumn("__z", zorder_key(bucket_cols, bits))
    if num_files:
        z = z.repartitionByRange(num_files, "__z")
    (
        z.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .options(**options)
        .parquet(path)
    )


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Load a directory of media files as an asset table via Spark's
    binaryFile source — the canonical ingestion path for an image/audio
    corpus laid out as files (one row per file: path, length, payload).

    Output matches llm/multimodal.ASSET_SCHEMA's core columns:
    (asset_id, media_type, payload) with media_type sniffed from magic
    bytes JVM-side-adjacent (a tiny mapInPandas over the already-read
    payloads — the bytes never move twice), asset_id = dense hash of
    the file path (stable across re-listing order).

    Scale posture: binaryFile splits by FILE (one task per file, bounded
    by spark.sql.files.maxPartitionBytes for grouping small files), so
    a 100 TB corpus of small images parallelizes by file count;
    `max_bytes` pushes a length filter into the source
    (pathGlobFilter/length pruning happens at listing time, before any
    payload read).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("path", T.StringType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dbt_lab_spark.llm.codecs import detect_format

        kind = {
            "bmp": "image", "ppm": "image", "pgm": "image", "png": "image",
            "gif": "image", "jpeg": "image", "tiff": "image", "wav": "audio", "mp3": "audio",
            "flac": "audio", "ogg": "audio", "webm/mkv": "video", "avi": "video",
        }
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "path": pdf["path"],
                    "media_type": [
                        kind.get(detect_format(bytes(p)), "unknown")
                        for p in pdf["content"]
                    ],
                    "n_bytes": pdf["length"],
                    "payload": pdf["content"],
                }
            )

    return df.select(
        F.xxhash64("path").alias("asset_id"), "path", "length", "content"
    ).mapInPandas(_classify, out_schema)


# ---------------------------------------------------------------------------
# WARC (ISO 28500): the container CommonCrawl and every web-scale text
# corpus actually arrives in.  Records are framed as
#   WARC/1.0\r\n <headers> \r\n\r\n <payload> \r\n\r\n
# with the payload size in Content-Length — so parsing is a linear
# scan, no entropy coding.  Build + parse round-trip through the real
# wire format, giving the ingestion query a genuine DuckDB oracle.
# ---------------------------------------------------------------------------

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("record_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def warc_record_bytes(
    record_type: str,
    target_uri: str,
    payload: bytes,
    warc_date: str = "2026-01-01T00:00:00Z",
) -> bytes:
    """One WARC 1.0 record, deterministically framed (record id is an
    md5-derived urn:uuid so two builds of the same corpus are
    byte-identical — required for hash-level oracle checks)."""
    import hashlib

    digest = hashlib.md5(target_uri.encode() + payload).hexdigest()
    rid = f"<urn:uuid:{digest[:8]}-{digest[8:12]}-{digest[12:16]}-{digest[16:20]}-{digest[20:32]}>"
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {record_type}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return headers + payload + b"\r\n\r\n"


def build_warc_shards(
    docs: DataFrame, n_shards: int = 8, compress: bool = False
) -> DataFrame:
    """Assemble documents into WARC shard blobs, one per hash bucket —
    the shape a crawler's writer produces (shard files of framed
    records).  Returns (shard_id, n_records, warc binary).

    compress=True emits the REAL CommonCrawl .warc.gz framing: each
    record is its own gzip member, concatenated — that's what makes
    web archives splittable (a reader can seek to any member
    boundary).  mtime is pinned to 0 so shard bytes stay
    deterministic.

    Scale posture: one applyInPandas group per shard; shard count is
    the parallelism knob and each task holds only its shard's bytes.
    Records within a shard are ordered by doc_id so the blob is
    deterministic under repartitioning."""
    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [
            T.StructField("shard_id", T.IntegerType()),
            T.StructField("n_records", T.LongType()),
            T.StructField("warc", T.BinaryType()),
        ]
    )

    def _assemble(key, pdf):
        import gzip
        import io

        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        blob = bytearray()
        for uri, text in zip(pdf["uri"], pdf["text"]):
            rec = warc_record_bytes("response", uri, str(text).encode("utf-8"))
            if compress:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                rec = buf.getvalue()
            blob += rec
        return pd.DataFrame(
            {"shard_id": [int(key[0])], "n_records": [len(pdf)], "warc": [bytes(blob)]}
        )

    with_uri = docs.select(
        "doc_id",
        "text",
        F.concat(F.lit("https://corpus.example/"), "source", F.lit("/"), "doc_id").alias("uri"),
        (F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")).alias("shard_id"),
    )
    return with_uri.groupBy("shard_id").applyInPandas(_assemble, out_schema)


def parse_warc(blobs: DataFrame, blob_col: str = "warc") -> DataFrame:
    """Parse WARC shard blobs back into one row per record — the
    ingestion direction.  Linear scan per blob: read the header block
    up to CRLFCRLF, take Content-Length, slice the payload, skip the
    record terminator.  Gzip multi-member blobs (.warc.gz, the real
    CommonCrawl framing — magic 1f 8b) are inflated transparently.
    Map-only (Arrow batches), no shuffle; malformed trailing bytes
    fail loudly rather than silently truncating."""
    from collections.abc import Iterator

    import pandas as pd

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for blob in pdf[blob_col]:
                data = bytes(blob)
                if data[:2] == b"\x1f\x8b":
                    # concatenated gzip members: zlib inflates one
                    # member at a time; loop over unused_data
                    import zlib

                    parts, rest = [], data
                    while rest[:2] == b"\x1f\x8b":
                        d = zlib.decompressobj(wbits=31)
                        parts.append(d.decompress(rest))
                        rest = d.unused_data
                    if rest:
                        raise ValueError("trailing garbage after gzip members")
                    data = b"".join(parts)
                pos = 0
                while pos < len(data):
                    if data[pos : pos + 5] != b"WARC/":
                        raise ValueError(f"WARC framing lost at offset {pos}")
                    hdr_end = data.index(b"\r\n\r\n", pos)
                    headers = {}
                    for line in data[pos:hdr_end].decode().split("\r\n")[1:]:
                        k, _, v = line.partition(": ")
                        headers[k.lower()] = v
                    clen = int(headers["content-length"])
                    payload = data[hdr_end + 4 : hdr_end + 4 + clen]
                    rows.append(
                        (
                            headers.get("warc-type", ""),
                            headers.get("warc-target-uri", ""),
                            headers.get("warc-date", ""),
                            clen,
                            payload,
                        )
                    )
                    pos = hdr_end + 4 + clen
                    if data[pos : pos + 4] != b"\r\n\r\n":
                        raise ValueError(f"missing WARC record terminator at {pos}")
                    pos += 4
            yield pd.DataFrame(
                rows,
                columns=[
                    "record_type",
                    "target_uri",
                    "warc_date",
                    "content_length",
                    "payload",
                ],
            )

    return blobs.mapInPandas(_parse, WARC_RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# WebDataset TAR shards (POSIX ustar): the layout LAION-scale
# multimodal corpora ship in — .tar shards whose members group into
# samples by basename ({key}.jpg + {key}.json + ...).  Headers are
# written from the ustar spec directly (512-byte blocks, octal fields,
# space-padded checksum) with all metadata pinned, so shard bytes are
# deterministic and the round-trip is oracle-checkable.
# ---------------------------------------------------------------------------


def _ustar_header(name: str, size: int) -> bytes:
    """One POSIX ustar file header, all non-essential metadata zeroed
    for determinism (mtime 0, uid/gid 0, mode 0644)."""
    nb = name.encode()
    if len(nb) > 100:
        raise ValueError(f"tar member name too long: {name!r}")
    hdr = bytearray(512)
    hdr[0 : len(nb)] = nb
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = f"{size:011o}".encode() + b"\x00"
    hdr[136:148] = b"00000000000\x00"
    hdr[148:156] = b" " * 8  # checksum computed over spaces
    hdr[156] = ord("0")  # regular file
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    chk = sum(hdr)
    hdr[148:156] = f"{chk:06o}".encode() + b"\x00 "
    return bytes(hdr)


def tar_bytes(members: list[tuple[str, bytes]]) -> bytes:
    """A complete deterministic ustar archive from (name, payload)
    members: header + 512-padded data each, two zero blocks at end."""
    out = bytearray()
    for name, payload in members:
        out += _ustar_header(name, len(payload))
        out += payload
        pad = (-len(payload)) % 512
        out += b"\x00" * pad
    out += b"\x00" * 1024
    return bytes(out)


def untar_bytes(blob: bytes) -> list[tuple[str, bytes]]:
    """Parse a ustar archive (any conforming producer): returns
    (name, payload) for regular-file members, verifying checksums."""
    out = []
    pos = 0
    while pos + 512 <= len(blob):
        hdr = blob[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break
        stored = int(hdr[148:156].split(b"\x00")[0].strip() or b"0", 8)
        calc = sum(hdr[:148]) + 8 * 32 + sum(hdr[156:])
        if stored != calc:
            raise ValueError(f"tar header checksum mismatch at offset {pos}")
        name = hdr[:100].split(b"\x00")[0].decode()
        prefix = hdr[345:500].split(b"\x00")[0].decode()
        if prefix:
            name = prefix + "/" + name
        size = int(hdr[124:136].split(b"\x00")[0].strip() or b"0", 8)
        typeflag = chr(hdr[156])
        data = blob[pos + 512 : pos + 512 + size]
        if typeflag in ("0", "\x00"):
            out.append((name, data))
        pos += 512 + size + ((-size) % 512)
    return out


WDS_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType()),
        T.StructField("key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def build_webdataset_shards(docs: DataFrame, n_shards: int = 8) -> DataFrame:
    """Pack documents into WebDataset tar shards: each doc contributes
    {doc_id:08d}.txt (UTF-8 body) and {doc_id:08d}.json (metadata) —
    the two-members-per-sample convention.  One applyInPandas group
    per shard, members doc_id-ordered for byte determinism."""
    import json as _json

    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [
            T.StructField("shard_id", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("tar", T.BinaryType()),
        ]
    )

    def _pack(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        members = []
        for doc_id, text, source in zip(pdf["doc_id"], pdf["text"], pdf["source"]):
            base = f"{int(doc_id):08d}"
            members.append((base + ".txt", str(text).encode("utf-8")))
            meta = _json.dumps(
                {"doc_id": int(doc_id), "source": str(source)}, sort_keys=True
            ).encode()
            members.append((base + ".json", meta))
        return pd.DataFrame(
            {
                "shard_id": [int(key[0])],
                "n_samples": [len(pdf)],
                "tar": [tar_bytes(members)],
            }
        )

    with_shard = docs.select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        "source",
        (F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")).alias("shard_id"),
    )
    return with_shard.groupBy("shard_id").applyInPandas(_pack, out_schema)


def read_webdataset(blobs: DataFrame, blob_col: str = "tar") -> DataFrame:
    """Unpack tar shard blobs into one row per member:
    (shard_id, key, ext, payload), key being the sample basename —
    downstream groups by key to reassemble samples.  Map-only over
    Arrow batches; works on any ustar-conforming shard."""
    from collections.abc import Iterator

    import pandas as pd

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for shard_id, blob in zip(pdf["shard_id"], pdf[blob_col]):
                for name, payload in untar_bytes(bytes(blob)):
                    base, _, ext = name.rpartition(".")
                    rows.append((int(shard_id), base, ext, payload))
            yield pd.DataFrame(rows, columns=["shard_id", "key", "ext", "payload"])

    return blobs.mapInPandas(_unpack, WDS_SAMPLE_SCHEMA)


PARQUET_STATS_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("row_group", T.IntegerType()),
        T.StructField("column", T.StringType()),
        T.StructField("num_rows", T.LongType()),
        T.StructField("num_values", T.LongType()),
        T.StructField("null_count", T.LongType()),
        T.StructField("min_value", T.StringType()),
        T.StructField("max_value", T.StringType()),
    ]
)


def parquet_rowgroup_stats(spark: SparkSession, path: str) -> DataFrame:
    """Parquet footer introspection as a DataFrame: one row per
    (file, row group, column) with min/max/null statistics — the ops
    tool behind 'which row groups would this predicate prune', layout
    debugging (see write_sorted/write_zordered), and compaction
    planning.  Footers only: no data pages are read.

    Scale posture: the FILE LISTING is driver-side (metadata-scale);
    footer parsing fans out one task per file batch via mapInPandas,
    so a million-file lake parallelizes while each task reads a few KB
    per footer."""
    import glob as _glob
    import os as _os

    from collections.abc import Iterator

    import pandas as pd

    if _os.path.isdir(path):
        files = sorted(_glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True))
    else:
        files = [path]
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    flist = local_df(spark, [(f,) for f in files], "file string", fanout=True)

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                for rg in range(md.num_row_groups):
                    rgm = md.row_group(rg)
                    for ci in range(rgm.num_columns):
                        col = rgm.column(ci)
                        st = col.statistics
                        has = st is not None and st.has_min_max
                        rows.append(
                            (
                                f,
                                rg,
                                col.path_in_schema,
                                rgm.num_rows,
                                col.num_values,
                                st.null_count if st else None,
                                str(st.min) if has else None,
                                str(st.max) if has else None,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "row_group", "column", "num_rows",
                    "num_values", "null_count", "min_value", "max_value",
                ],
            )

    return flist.mapInPandas(_stats, PARQUET_STATS_SCHEMA)


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written under
    EVOLVING schemas (columns added over time — the normal life of a
    long-lived corpus): mergeSchema unions the per-file footers, and
    files missing a newer column surface NULLs for it.  Spark's
    default reads ONE footer, silently dropping late columns — this
    wrapper exists so ingestion code never depends on file listing
    order."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def zip_bytes(members: list[tuple[str, bytes]]) -> bytes:
    """Deterministic ZIP archive (stdlib zipfile, STORED — container
    framing is the point here, codecs live in llm/codecs.py; the
    timestamp is pinned so archives are byte-stable)."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as z:
        for name, payload in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(info, payload)
    return buf.getvalue()


def unzip_bytes(blob: bytes) -> list[tuple[str, bytes]]:
    """Parse a ZIP archive blob (any producer; DEFLATE members inflate
    via stdlib).  CRC mismatches raise — corrupt members never pass
    silently."""
    import io
    import zipfile

    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        return [(i.filename, z.read(i.filename)) for i in z.infolist()]


def read_zip_shards(blobs: DataFrame, blob_col: str = "zip") -> DataFrame:
    """Unpack ZIP shard blobs into one row per member — same sample
    contract as read_webdataset ({key}.{ext} grouping downstream), for
    datasets that ship zipped (Kaggle exports, scraped dumps)."""
    from collections.abc import Iterator

    import pandas as pd

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows_cols = ["shard_id", "key", "ext", "payload"]
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for shard_id, blob in zip(pdf["shard_id"], pdf[blob_col]):
                for name, payload in unzip_bytes(bytes(blob)):
                    base, _, ext = name.rpartition(".")
                    rows.append((int(shard_id), base, ext, payload))
            yield pd.DataFrame(rows, columns=rows_cols)

    return blobs.mapInPandas(_unpack, WDS_SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# Avro Object Container Files (spec-implemented; Apache Avro 1.11 spec)
# ---------------------------------------------------------------------------

_AVRO_MAGIC = b"Obj\x01"


def _avro_zigzag(n: int) -> bytes:
    """Avro long: zigzag + base-128 varint (spec 'Primitive Types')."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _avro_encode_value(v, typ: str, out: bytearray) -> None:
    import struct as _struct

    if isinstance(typ, list):  # union, e.g. ["null", "string"]
        if v is None:
            out += _avro_zigzag(typ.index("null"))
            return
        branch = next(i for i, t in enumerate(typ) if t != "null")
        out += _avro_zigzag(branch)
        _avro_encode_value(v, typ[branch], out)
        return
    if typ in ("long", "int"):
        out += _avro_zigzag(int(v))
    elif typ == "string":
        raw = str(v).encode("utf-8")
        out += _avro_zigzag(len(raw)) + raw
    elif typ == "bytes":
        raw = bytes(v)
        out += _avro_zigzag(len(raw)) + raw
    elif typ == "double":
        out += _struct.pack("<d", float(v))
    elif typ == "float":
        out += _struct.pack("<f", float(v))
    elif typ == "boolean":
        out += b"\x01" if v else b"\x00"
    else:
        raise ValueError(f"unsupported avro type: {typ}")


def _avro_decode_value(buf: bytes, pos: int, typ: str):
    import struct as _struct

    if isinstance(typ, list):
        branch, pos = _avro_read_long(buf, pos)
        t = typ[branch]
        if t == "null":
            return None, pos
        return _avro_decode_value(buf, pos, t)
    if typ in ("long", "int"):
        return _avro_read_long(buf, pos)
    if typ in ("string", "bytes"):
        n, pos = _avro_read_long(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if typ == "string" else bytes(raw)), pos + n
    if typ == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    raise ValueError(f"unsupported avro type: {typ}")


def avro_file_bytes(
    records: list[dict],
    fields: list[tuple[str, object]],
    name: str = "record0",
    codec: str = "deflate",
    sync: bytes | None = None,
) -> bytes:
    """Serialize records into ONE Avro Object Container File: magic,
    metadata map (avro.schema + avro.codec), sync marker, then one data
    block (record count, byte length, payload, sync).  Supported field
    types: long/int/string/bytes/double/float/boolean and
    ["null", <primitive>] unions — the generic-row subset.

    `sync` defaults to an md5 of the schema+count, NOT random bytes:
    the engine's byte-determinism convention (same input → same shard
    bytes) that every shard writer here follows."""
    import hashlib as _hashlib
    import json as _json
    import zlib as _zlib

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec}")
    schema = {
        "type": "record",
        "name": name,
        "fields": [{"name": fn, "type": ft} for fn, ft in fields],
    }
    schema_json = _json.dumps(schema, sort_keys=True).encode()
    if sync is None:
        sync = _hashlib.md5(schema_json + _avro_zigzag(len(records))).digest()
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    out = bytearray(_AVRO_MAGIC)
    meta = [(b"avro.schema", schema_json), (b"avro.codec", codec.encode())]
    out += _avro_zigzag(len(meta))
    for k, v in meta:
        out += _avro_zigzag(len(k)) + k + _avro_zigzag(len(v)) + v
    out += _avro_zigzag(0)  # metadata map terminator
    out += sync
    body = bytearray()
    for rec in records:
        for fn, ft in fields:
            _avro_encode_value(rec.get(fn), ft, body)
    payload = bytes(body)
    if codec == "deflate":
        payload = _zlib.compress(payload, 6)[2:-4]  # raw deflate per spec
    out += _avro_zigzag(len(records)) + _avro_zigzag(len(payload)) + payload + sync
    return bytes(out)


def parse_avro_bytes(blob: bytes) -> tuple[list[str], list[dict]]:
    """Parse one Avro Object Container File into (field_names, record
    dicts), honoring the embedded writer schema (reader-makes-right).
    Validates the magic and every block's sync marker; raises on
    corruption rather than returning partial rows."""
    import json as _json
    import zlib as _zlib

    if blob[:4] != _AVRO_MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _avro_read_long(blob, pos)
        if count == 0:
            break
        if count < 0:  # spec: negative count precedes a byte size
            _, pos = _avro_read_long(blob, pos)
            count = -count
        for _ in range(count):
            klen, pos = _avro_read_long(blob, pos)
            key = blob[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _avro_read_long(blob, pos)
            meta[key] = blob[pos : pos + vlen]
            pos += vlen
    sync = blob[pos : pos + 16]
    pos += 16
    schema = _json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec}")
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    records: list[dict] = []
    while pos < len(blob):
        n_rec, pos = _avro_read_long(blob, pos)
        n_bytes, pos = _avro_read_long(blob, pos)
        payload = blob[pos : pos + n_bytes]
        pos += n_bytes
        if blob[pos : pos + 16] != sync:
            raise ValueError("avro block sync marker mismatch (corrupt file)")
        pos += 16
        if codec == "deflate":
            payload = _zlib.decompress(payload, -15)
        p = 0
        for _ in range(n_rec):
            rec = {}
            for fn, ft in fields:
                rec[fn], p = _avro_decode_value(payload, p, ft)
            records.append(rec)
        if p != len(payload):
            raise ValueError("avro block decoded short/long (corrupt payload)")
    return [fn for fn, _ in fields], records


_AVRO_DOC_FIELDS: list[tuple[str, object]] = [
    ("doc_id", "long"),
    ("text", ["null", "string"]),
    ("lang", ["null", "string"]),
    ("source", ["null", "string"]),
    ("n_chars", "long"),
]

AVRO_DOC_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def build_avro_shards(docs: DataFrame, n_shards: int = 8, codec: str = "deflate") -> DataFrame:
    """Pack documents into Avro object-container shards (one file per
    shard, doc_id-ordered for byte determinism) — the row-oriented
    interchange format streaming ingest pipelines hand off in.  One
    applyInPandas group per shard, same contract as the WebDataset/ZIP
    writers."""
    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [
            T.StructField("shard_id", T.IntegerType()),
            T.StructField("n_records", T.LongType()),
            T.StructField("avro", T.BinaryType()),
        ]
    )

    def _pack(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        recs = [
            {
                "doc_id": int(r.doc_id),
                "text": None if r.text is None else str(r.text),
                "lang": None if r.lang is None else str(r.lang),
                "source": None if r.source is None else str(r.source),
                "n_chars": int(r.n_chars),
            }
            for r in pdf.itertuples()
        ]
        blob = avro_file_bytes(recs, _AVRO_DOC_FIELDS, name="doc", codec=codec)
        return pd.DataFrame(
            {"shard_id": [int(key[0])], "n_records": [len(recs)], "avro": [blob]}
        )

    with_shard = docs.select(
        "doc_id", "text", "lang", "source", "n_chars",
        (F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")).alias("shard_id"),
    )
    return with_shard.groupBy("shard_id").applyInPandas(_pack, out_schema)


def read_avro_docs(blobs: DataFrame, blob_col: str = "avro") -> DataFrame:
    """Unpack Avro document shards into one row per record — map-only
    over Arrow batches, decoding against each file's embedded writer
    schema (reader-makes-right; column order follows AVRO_DOC_SCHEMA
    regardless of writer field order)."""
    from collections.abc import Iterator

    import pandas as pd

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AVRO_DOC_SCHEMA.fields]
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for shard_id, blob in zip(pdf["shard_id"], pdf[blob_col]):
                _, recs = parse_avro_bytes(bytes(blob))
                for rec in recs:
                    rows.append(
                        (
                            int(shard_id),
                            rec["doc_id"],
                            rec["text"],
                            rec["lang"],
                            rec["source"],
                            rec["n_chars"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return blobs.mapInPandas(_unpack, AVRO_DOC_SCHEMA)


# ---------------------------------------------------------------------------
# NPY / safetensors embedding interchange (spec-implemented both ways)
# ---------------------------------------------------------------------------
#
# The two formats embedding pipelines actually hand tensors around in:
# NumPy's .npy (format spec v1.0 — magic, ASCII dict header, raw
# C-order buffer) and Hugging Face safetensors (8-byte LE header
# length + JSON tensor table with byte offsets + concatenated
# buffers).  Both are implemented from their public specs with
# struct/json only, so the round trip is testable end-to-end like the
# Avro/WARC/WebDataset paths.


def npy_bytes(arr) -> bytes:
    """Serialize an ndarray to .npy (format spec v1.0): \\x93NUMPY,
    version 1.0, 64-byte-aligned ASCII header dict, raw C-order data."""
    import struct as _struct

    import numpy as _np

    arr = _np.ascontiguousarray(arr)
    header = "{'descr': '%s', 'fortran_order': False, 'shape': %s, }" % (
        arr.dtype.str,
        str(arr.shape if len(arr.shape) != 1 else (arr.shape[0],)),
    )
    base = len(b"\x93NUMPY") + 2 + 2
    pad = 64 - ((base + len(header) + 1) % 64)
    header = header + " " * pad + "\n"
    return (
        b"\x93NUMPY"
        + bytes([1, 0])
        + _struct.pack("<H", len(header))
        + header.encode("ascii")
        + arr.tobytes()
    )


def parse_npy_bytes(payload: bytes):
    """Parse .npy v1/v2 bytes back to an ndarray (little-endian bool/
    int/float descrs, C order)."""
    import ast as _ast
    import struct as _struct

    import numpy as _np

    if payload[:6] != b"\x93NUMPY":
        raise ValueError("npy: bad magic")
    major = payload[6]
    if major == 1:
        (hlen,) = _struct.unpack("<H", payload[8:10])
        off = 10
    elif major == 2:
        (hlen,) = _struct.unpack("<I", payload[8:12])
        off = 12
    else:
        raise ValueError(f"npy: unsupported version {major}")
    header = _ast.literal_eval(payload[off : off + hlen].decode("ascii").strip())
    if header["fortran_order"]:
        raise ValueError("npy: fortran order unsupported")
    dt = _np.dtype(header["descr"])
    shape = tuple(header["shape"])
    n = int(_np.prod(shape)) if shape else 1
    data = _np.frombuffer(payload, dtype=dt, count=n, offset=off + hlen)
    return data.reshape(shape)


_SAFETENSORS_DTYPES = {"F32": "<f4", "F64": "<f8", "I64": "<i8", "I32": "<i4"}


def safetensors_bytes(tensors: dict) -> bytes:
    """Serialize {name: ndarray} to safetensors: u64-LE header length,
    JSON tensor table (name -> dtype/shape/data_offsets), concatenated
    raw little-endian buffers.  Names are sorted for byte determinism."""
    import json as _json
    import struct as _struct

    import numpy as _np

    rev = {v: k for k, v in _SAFETENSORS_DTYPES.items()}
    table = {}
    bufs = []
    off = 0
    for name in sorted(tensors):
        arr = _np.ascontiguousarray(tensors[name])
        key = arr.dtype.newbyteorder("<").str
        if key not in rev:
            raise ValueError(f"safetensors: unsupported dtype {arr.dtype}")
        raw = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
        table[name] = {
            "dtype": rev[key],
            "shape": list(arr.shape),
            "data_offsets": [off, off + len(raw)],
        }
        bufs.append(raw)
        off += len(raw)
    header = _json.dumps(table, sort_keys=True, separators=(",", ":")).encode("utf-8")
    return _struct.pack("<Q", len(header)) + header + b"".join(bufs)


def parse_safetensors_bytes(payload: bytes) -> dict:
    """Parse safetensors bytes back to {name: ndarray}."""
    import json as _json
    import struct as _struct

    import numpy as _np

    (hlen,) = _struct.unpack("<Q", payload[:8])
    table = _json.loads(payload[8 : 8 + hlen].decode("utf-8"))
    base = 8 + hlen
    out = {}
    for name, meta in table.items():
        if name == "__metadata__":
            continue
        dt = _np.dtype(_SAFETENSORS_DTYPES[meta["dtype"]])
        s, e = meta["data_offsets"]
        arr = _np.frombuffer(payload, dtype=dt, count=(e - s) // dt.itemsize,
                             offset=base + s)
        out[name] = arr.reshape(meta["shape"])
    return out


_VEC_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType()),
        T.StructField("n_vecs", T.LongType()),
        T.StructField("blob", T.BinaryType()),
    ]
)

_VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _build_vector_shards(
    df: DataFrame, packer, n_shards: int, vec_col: str, id_col: str
) -> DataFrame:
    from pyspark.sql import functions as F

    def _pack(key, pdf):
        import numpy as _np
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy().astype("int64")
        mat = _np.stack(pdf[vec_col].to_numpy()).astype("<f4")
        return pd.DataFrame(
            {
                "shard_id": [int(key[0])],
                "n_vecs": [len(ids)],
                "blob": [packer(ids, mat)],
            }
        )

    with_shard = df.select(
        F.col(id_col), F.col(vec_col),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard_id"),
    )
    return with_shard.groupBy("shard_id").applyInPandas(_pack, _VEC_SHARD_SCHEMA)


def build_npy_shards(
    df: DataFrame, n_shards: int = 8, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Pack (vec_id, embedding) into .npy shard blobs — two stacked
    .npy files per shard (int64 ids, float32 (n,d) matrix) framed by a
    u32 length prefix on the first.  One applyInPandas group per
    shard, vec_id-ordered for byte determinism."""
    import struct as _struct

    def _packer(ids, mat):
        a = npy_bytes(ids)
        b = npy_bytes(mat)
        return _struct.pack("<I", len(a)) + a + b

    return _build_vector_shards(df, _packer, n_shards, vec_col, id_col)


def read_npy_vectors(shards: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Unpack .npy vector shards to (vec_id, embedding) — map-only."""
    import struct as _struct
    from collections.abc import Iterator

    import pandas as pd

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids_all, vecs_all = [], []
            for blob in pdf[blob_col]:
                blob = bytes(blob)
                (alen,) = _struct.unpack("<I", blob[:4])
                ids = parse_npy_bytes(blob[4 : 4 + alen])
                mat = parse_npy_bytes(blob[4 + alen :])
                ids_all.extend(int(i) for i in ids)
                vecs_all.extend(row.tolist() for row in mat)
            yield pd.DataFrame({"vec_id": ids_all, "embedding": vecs_all})

    return shards.mapInPandas(_unpack, _VEC_SCHEMA)


def build_safetensors_shards(
    df: DataFrame, n_shards: int = 8, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Pack (vec_id, embedding) into safetensors shard blobs (tensors
    'ids' I64 and 'embeddings' F32) — the checkpoint-interchange
    format, one applyInPandas group per shard."""

    def _packer(ids, mat):
        return safetensors_bytes({"ids": ids, "embeddings": mat})

    return _build_vector_shards(df, _packer, n_shards, vec_col, id_col)


def build_arrow_ipc_shards(
    df: DataFrame, n_shards: int = 8, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Pack (vec_id, embedding) into Arrow IPC stream shard blobs —
    one record batch per shard with columns (ids int64, embeddings
    fixed_size_list<float32>[d]).  Arrow IPC is the zero-copy
    interchange format Spark itself uses for Pandas UDF transport, so
    this is the natural wire format for feature-store export/import;
    serialization of a fixed batch is byte-deterministic.  One
    applyInPandas group per shard, vec_id-ordered."""

    def _packer(ids, mat):
        import io as _io

        import pyarrow as _pa

        d = int(mat.shape[1]) if mat.ndim == 2 else 0
        values = _pa.array(mat.reshape(-1), type=_pa.float32())
        emb = _pa.FixedSizeListArray.from_arrays(values, d)
        batch = _pa.record_batch(
            [_pa.array(ids, type=_pa.int64()), emb], names=["ids", "embeddings"]
        )
        sink = _io.BytesIO()
        with _pa.ipc.new_stream(sink, batch.schema) as w:
            w.write_batch(batch)
        return sink.getvalue()

    return _build_vector_shards(df, _packer, n_shards, vec_col, id_col)


def read_arrow_ipc_vectors(shards: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Unpack Arrow IPC vector shards to (vec_id, embedding) — map-only."""
    from collections.abc import Iterator

    import pandas as pd

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as _pa

        for pdf in batches:
            if not len(pdf):
                continue
            ids_all, vecs_all = [], []
            for blob in pdf[blob_col]:
                with _pa.ipc.open_stream(_pa.BufferReader(bytes(blob))) as r:
                    t = r.read_all()
                ids_all.extend(int(i) for i in t.column("ids").to_pylist())
                vecs_all.extend(
                    [float(x) for x in v] for v in t.column("embeddings").to_pylist()
                )
            yield pd.DataFrame({"vec_id": ids_all, "embedding": vecs_all})

    return shards.mapInPandas(_unpack, _VEC_SCHEMA)


def read_safetensors_vectors(shards: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Unpack safetensors vector shards to (vec_id, embedding)."""
    from collections.abc import Iterator

    import pandas as pd

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids_all, vecs_all = [], []
            for blob in pdf[blob_col]:
                t = parse_safetensors_bytes(bytes(blob))
                ids_all.extend(int(i) for i in t["ids"])
                vecs_all.extend(row.tolist() for row in t["embeddings"])
            yield pd.DataFrame({"vec_id": ids_all, "embedding": vecs_all})

    return shards.mapInPandas(_unpack, _VEC_SCHEMA)
