"""r6 pins: watermark late-data drop semantics (VERDICT r5 #5) and the
one-batch lateEvents lag that shapes the replay layout."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _land(src: str, ts_hours: list[int], order: int) -> None:
    tbl = pa.table(
        {
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1, h) for h in ts_hours],
                pa.timestamp("us"),
            ),
            "cents": pa.array([1] * len(ts_hours), "int64"),
        }
    )
    os.makedirs(src, exist_ok=True)
    p = os.path.join(src, f"{order:02d}.parquet")
    pq.write_table(tbl, p)
    t = 1_000_000_000 + order * 3600
    os.utime(p, (t, t))


def _run(spark, src: str, ckpt: str):
    from dbt_lab_spark.streaming.windows import hourly_rollup_with_watermark

    out = hourly_rollup_with_watermark(
        spark, src, "ts timestamp, cents long", checkpoint_dir=ckpt
    )
    return sorted((r.h, r.n_events) for r in out.collect())


def test_watermark_drops_late_row_hand_computed(spark, tmp_path):
    """On-time rows at 10:00 and 12:00 advance the watermark to 11:00;
    a sentinel at 20:00 settles it at 19:00 for one batch; then a late
    row at 9:00 (window end 10:00 << 19:00) MUST be dropped: the 9:00
    window never reaches append output, and the sentinel's unfinalized
    window doesn't either."""
    src = str(tmp_path / "src")
    _land(src, [10, 12], 0)
    _land(src, [20], 1)  # sentinel: wm -> 19:00, settled before the late batch
    _land(src, [9], 2)  # late
    got = _run(spark, src, str(tmp_path / "ck"))
    h10 = int(datetime.datetime(2024, 1, 1, 10).timestamp() * 1000) // 3600000
    h12 = h10 + 2
    assert got == [(h10, 1), (h12, 1)]


def test_watermark_late_filter_lags_one_batch(spark, tmp_path):
    """The documented hazard the sentinel-first layout works around
    (SPARK-40925): a late row arriving in the VERY batch where the
    watermark first advances past it is still accepted, because the
    lateEvents filter uses the previous batch's watermark.  Pinned so
    an engine upgrade that changes this surfaces loudly."""
    src = str(tmp_path / "src")
    _land(src, [10, 12], 0)  # wm after this batch: 11:00
    _land(src, [9], 1)  # arrives with lateEvents wm still 1970 -> accepted
    _land(src, [20], 2)  # sentinel flushes all windows
    got = _run(spark, src, str(tmp_path / "ck"))
    h9 = int(datetime.datetime(2024, 1, 1, 9).timestamp() * 1000) // 3600000
    assert (h9, 1) in got  # the row survived: that's WHY q_stream_watermark
    # lands its sentinel BEFORE the late file


def test_on_time_rows_within_watermark_never_dropped(spark, tmp_path):
    """The other half of the watermark contract: rows INSIDE the delay
    are aggregated even when they arrive out of order."""
    src = str(tmp_path / "src")
    _land(src, [10, 11], 0)  # wm -> 10:00
    _land(src, [10], 1)  # in-order-of-watermark: 10:00 window end 11:00 > 10:00
    _land(src, [20], 2)
    got = _run(spark, src, str(tmp_path / "ck"))
    h10 = int(datetime.datetime(2024, 1, 1, 10).timestamp() * 1000) // 3600000
    assert (h10, 2) in got


def test_hamming_cap_preserves_cold_band_pairs(spark):
    """r6 (DEDUP_SCALE_r6): max_bucket_size drops only buckets hot in
    EVERY matching band — a mass-duplicated asset's self-pairs vanish,
    while clustered pairs that match in any cold band all survive."""
    from dbt_lab_spark.llm.dedup import hamming_dedup_pairs

    rows = []
    for g in range(50):  # clustered plant: 50 triples within hamming 2
        base = (0x9E3779B97F4A7C15 * (g + 1)) & ((1 << 62) - 1)
        rows += [(g * 3, base), (g * 3 + 1, base ^ 1), (g * 3 + 2, base ^ (1 << 20))]
    hot = [(10_000 + i, 0x0123456789ABCDE0 ^ (i & 1)) for i in range(500)]
    df = spark.createDataFrame(rows + hot, "doc_id long, h long")
    capped = hamming_dedup_pairs(
        df, hash_col="h", max_hamming=2, max_bucket_size=100
    )
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert len(got) == 150  # 3 per triple, zero from the hot plant
    assert all(a < 10_000 and b < 10_000 for a, b in got)
    # uncapped finds the hot clique too (and stays exact on the triples)
    n_uncapped = hamming_dedup_pairs(df, hash_col="h", max_hamming=2).count()
    assert n_uncapped == 150 + 500 * 499 // 2
