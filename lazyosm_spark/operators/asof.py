"""As-of join — the grouped-pandas formulation.

Spark has no native as-of join.  The engine ships two formulations:

- the WINDOW form (plans/driver_queries.q_asof): running max of the
  right-side timestamp over the unioned, time-ordered stream — fully
  JVM, one shuffle, the at-scale default;
- this applyInPandas form: per-key grouped kernel doing a vectorized
  ffill/shift pass (pandas' merge_asof semantics with strictly-prior
  matching and (ts, seq) tie order) — the shape to reach for when the
  per-key logic outgrows window expressions (multi-column carries,
  tolerance windows, nearest-direction matches).

Both are value-checked against the same DuckDB oracle (driver queries
`asof_join` and `asof_join_pandas`).

NB: built on union + groupBy().applyInPandas, NOT cogroup —
pyarrow 16.1's cogroup serializer segfaults on multi-row batches.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves type hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASOF_SCHEMA = "event_id long, secs_since_view long"


def _asof_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One key's rows (both sides tagged): sort by (ts, seq), carry the
    last strictly-prior right-side ts forward, emit left rows."""
    rows = pdf.sort_values(["ts", "seq"]).reset_index(drop=True)
    ts_s = rows["ts"].astype("int64") // 1_000_000_000  # truncating secs
    right_ts = ts_s.where(rows["side"] == "R")
    prior_right = right_ts.ffill().shift(1)  # strictly prior row
    left = rows["side"] == "L"
    out = pd.DataFrame(
        {
            "event_id": rows.loc[left, "seq"],
            "secs_since_view": (ts_s - prior_right)[left],
        }
    )
    # pandas keeps NaN for never-matched rows -> nullable long
    out["secs_since_view"] = out["secs_since_view"].astype("Int64")
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    seq: str = "event_id",
) -> DataFrame:
    """left(by, seq, ts) x right(by, seq, ts) ->
    (event_id, secs_since_view): for each left row, seconds since the
    most recent strictly-prior right row of the same key ((ts, seq)
    tie order, truncating-second arithmetic — identical semantics to
    the window formulation)."""
    l_ = left.select(
        F.col(by).alias("by"), F.col(seq).alias("seq"), F.col(ts).alias("ts")
    ).withColumn("side", F.lit("L"))
    r_ = right.select(
        F.col(by).alias("by"), F.col(seq).alias("seq"), F.col(ts).alias("ts")
    ).withColumn("side", F.lit("R"))
    return (
        l_.unionByName(r_)
        .groupBy("by")
        .applyInPandas(_asof_group, ASOF_SCHEMA)
    )
