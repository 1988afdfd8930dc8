#!/usr/bin/env python3
"""One-shot generator for the timestamp-flavor loader fixtures
(src/test/resources/tsflavors/*/events.parquet).

The driver has regenerated /root/testdata twice with different parquet
timestamp flavors (SURVEY §1.2): TIMESTAMP(NANOS) first, then naive
(isAdjustedToUTC=false) µs. TimestampFlavorSpec loads a tiny synthetic
parquet of EACH flavor through graft.Tables and asserts the normalized
schema/values, so a THIRD regeneration (UTC-adjusted µs, ms revival, a
new nanos run) fails fast in `sbt test` instead of silently in Verify.

Run from the repo root (pyarrow is a driver-side tool; the committed
binary fixtures are plain data and the Scala tests depend only on them):
  python3 scripts/gen_ts_fixtures.py
"""
import pyarrow as pa
import pyarrow.parquet as pq
import pathlib

root = pathlib.Path(__file__).resolve().parent.parent / "src/test/resources/tsflavors"

# the same three instants in every flavor (2024-03-01T00:00:00Z + i hours,
# with sub-second digits so µs precision is visibly preserved)
US = [1709251200_000000 + i * 3600_000000 + 123456 for i in range(3)]

rows = {
    "event_id": pa.array([1, 2, 3], pa.int64()),
    "user_id": pa.array([10, 20, 30], pa.int64()),
    "event_type": pa.array(["view", "click", "purchase"], pa.string()),
    "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
    "props": pa.array(["{}", "{}", "{}"], pa.string()),
}

def write(flavor: str, ts: pa.Array):
    out = root / flavor
    out.mkdir(parents=True, exist_ok=True)
    t = pa.table({"event_id": rows["event_id"], "ts": ts, **{k: rows[k] for k in
                  ["user_id", "event_type", "value", "props"]}})
    pq.write_table(t, out / "events.parquet")
    print(flavor, t.schema.field("ts").type)

# pre-r7 generation: TIMESTAMP(NANOS), naive
write("ns", pa.array([u * 1000 for u in US], pa.timestamp("ns")))
# r7 generation: µs, naive (isAdjustedToUTC=false → Spark reads TIMESTAMP_NTZ)
write("us_naive", pa.array(US, pa.timestamp("us")))
# plausible third generation: µs, UTC-adjusted (Spark reads TimestampType)
write("us_utc", pa.array(US, pa.timestamp("us", tz="UTC")))
