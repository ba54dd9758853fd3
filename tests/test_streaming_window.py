"""Watermarked windowed rollup: late-data semantics, stream vs batch.

Micro-batches arrive out of order. Spark's watermark contract is
one-sided: rows inside the horizon are GUARANTEED to be aggregated,
rows beyond it are dropped only once their window has been finalized
and evicted. So the too-late row here targets a window that was
already emitted a full batch earlier — its drop is guaranteed — and
the final output is compared against the batch computation over the
admitted rows, with an exactly-once check per window (append mode)."""
import os
import time
from datetime import datetime

import pandas as pd


def _write_batch(d, i, rows):
    # flat single files: the streaming file source does not recurse
    # into the subdirectories Spark's own writer produces
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(f"{d}/in", exist_ok=True)
    cols = list(zip(*rows))
    pq.write_table(pa.table({
        "event_id": pa.array(cols[0], pa.int64()),
        "ts": pa.array(cols[1], pa.timestamp("us")),
        "event_type": pa.array(cols[2], pa.string()),
        "value": pa.array(cols[3], pa.float64()),
    }), f"{d}/in/b{i}.parquet")
    time.sleep(0.15)  # file-source ordering is by mod time


def test_watermark_drops_only_too_late(spark, tmp_path):
    from document_extractor_spark.streaming import windowed_event_rollup

    d = str(tmp_path)
    T = datetime.fromisoformat
    # watermark horizon is 2h; batches are one file each
    _write_batch(d, 0, [
        (1, T("2026-01-01 00:10"), "click", 1.0),
        (2, T("2026-01-01 00:40"), "click", 2.0),
        (3, T("2026-01-01 01:10"), "view", 4.0),
    ])
    # advances the watermark to 03:30 after this batch
    _write_batch(d, 1, [(4, T("2026-01-01 05:30"), "view", 8.0)])
    # processed with wm 03:30 -> windows 00:00 and 01:00 are EMITTED
    # here; advances the watermark to 04:00
    _write_batch(d, 2, [(7, T("2026-01-01 06:00"), "view", 64.0)])
    # event 6 targets the already-emitted 00:00 click window: its drop
    # is guaranteed. event 5 is out of order but inside the horizon.
    _write_batch(d, 3, [
        (6, T("2026-01-01 00:50"), "click", 32.0),   # TOO LATE
        (5, T("2026-01-01 04:10"), "click", 16.0),
    ])
    # far-future sentinel advances the watermark past every real
    # window; availableNow runs a final empty batch that flushes them
    _write_batch(d, 4, [(8, T("2026-01-02 12:00"), "sentinel", 0.0)])

    stream = (
        spark.readStream
        .schema("event_id long, ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/in")
    )
    q = (
        windowed_event_rollup(stream).writeStream
        .format("memory").queryName("wm_rollup")
        .option("checkpointLocation", f"{d}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("wm_rollup")
        .filter("event_type <> 'sentinel'")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )

    # batch twin over the admitted rows (all but the guaranteed drop);
    # watermark is a no-op on a batch DataFrame, same code path
    admitted = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{d}/in")
        .filter("event_id not in (6, 8)")
    )
    want = (
        windowed_event_rollup(admitted)
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # the late-but-in-horizon row made it into its window
    r = got[(got.window_start == T("2026-01-01 04:00"))
            & (got.event_type == "click")]
    assert len(r) == 1 and r.total_value.iloc[0] == 16.0
    # append mode: every window emitted exactly once
    assert not got.duplicated(["window_start", "event_type"]).any()
