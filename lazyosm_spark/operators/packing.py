"""Training-sequence packing + deterministic sampling.

The two curation ops every LLM pretraining pipeline runs after dedup:

- pack_sequences: GPT-style concat-then-chunk packing.  Documents are
  laid end-to-end in a deterministic pseudo-random order (md5 of the
  doc id — the standard "shuffle then pack" without a real RNG) and
  the token stream is chunked into fixed ctx_len sequences; each doc
  reports the sequence its first token lands in and its offset there.
- stratified_sample: hash-threshold Bernoulli sampling, optionally
  per-group rates — the reproducible sampler (same doc set at any
  parallelism, resumable, no RNG state), the standard down-weighting
  move for over-represented strata.

SCALE DESIGN — the distributed prefix sum: packing needs a GLOBAL
running sum of token counts in hash order.  A plain window over a
global ORDER BY is an Exchange SinglePartition — one task owns 100 TB.
``global_cumsum`` instead range-buckets the (uniform) 60-bit hash into
n_buckets spans — balanced by construction, no stats pass — computes
per-bucket partial sums (one small aggregate), prefix-sums the bucket
offsets on the driver (n_buckets values), and adds the broadcast
offset to a per-bucket window cumsum.  No single-partition exchange
anywhere (plan-audited); the result is bit-identical to the one-window
formulation, which the DuckDB oracle runs.  Measured at 10M rows on
local[32]: 5.8s vs 11.0s for the single-partition window — and the
local gap understates the cluster one, where the single window is one
executor holding the entire table (an OOM, not a slowdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lazyosm_spark.functions.hashing import md5_long, md5_long_sql

_HASH_SPAN = 1 << 60  # md5_long range


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    n_buckets: int = 256,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Running sum of ``value_col`` over the total order of
    (``order_col``[, ``tiebreak_col``]) — order_col a uniform hash in
    [0, 2^60) — without a single-partition window: range-bucket the
    hash, per-bucket partial sums -> driver prefix -> broadcast
    offsets -> per-bucket window.  Appends ``out_col`` (inclusive
    running sum, ROWS frame).

    Pass ``tiebreak_col`` (unique) whenever order_col can collide:
    hash ties are window PEERS under the default RANGE frame and would
    receive one shared cum (overlapping positions); the explicit ROWS
    frame + tiebreak gives colliding rows distinct, deterministic cums
    — matching an ORDER BY h, tiebreak ROWS oracle.

    Bucketing is INTEGER division (h div step, clamped): the double
    division `h/step` rounds hashes in the top ~64 values of the range
    up to bucket n_buckets, which has no offsets-map entry -> NULL
    cum — a silent-corruption bug at trillion-row scale."""
    step = _HASH_SPAN // n_buckets
    with_b = df.withColumn(
        "_b",
        F.least(
            F.lit(n_buckets - 1), F.expr(f"{order_col} div {step}")
        ).cast("int"),
    )
    # n_buckets partial sums: the only aggregate; rows never leave
    # their bucket partition for the scan below
    parts = {
        int(r["_b"]): int(r["s"])
        for r in with_b.groupBy("_b").agg(F.sum(value_col).alias("s")).collect()
    }
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += parts.get(b, 0)
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("_b"),
    )
    order = [F.col(order_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = (
        Window.partitionBy("_b")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return with_b.withColumn(
        out_col, (F.sum(value_col).over(w) + off).cast("long")
    ).drop("_b")


def pack_sequences(
    docs: DataFrame,
    ctx_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 256,
) -> DataFrame:
    """Concat-then-chunk packing: documents concatenated in md5(doc_id)
    order, token stream chunked every ctx_len.
    -> (doc_id, seq_id, offset, n_tokens, n_seqs_spanned) where seq_id
    is the training sequence holding the doc's FIRST token, offset its
    position there, and n_seqs_spanned how many chunk boundaries the
    doc crosses + 1 (long docs straddle sequences — by design in
    concat-then-chunk; filter or split downstream if unwanted)."""
    h = md5_long(F.col(id_col).cast("string"))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        h.alias("_h"),
    )
    cum = global_cumsum(
        base, "_h", "n_tokens", out_col="_cum", n_buckets=n_buckets,
        tiebreak_col="doc_id",
    )
    # integer division (SQL `div`, nonneg operands): exact at ANY
    # token-stream length — a double floor(x/ctx) loses exactness past
    # 2^53 total tokens, within reach of a 100 TB corpus
    c = int(ctx_len)
    tmp = cum.select(
        "doc_id",
        "n_tokens",
        (F.col("_cum") - F.col("n_tokens")).alias("_start"),
        (F.col("_cum") - 1).alias("_last"),
    )
    return tmp.select(
        "doc_id",
        F.expr(f"_start div {c}").cast("long").alias("seq_id"),
        (F.col("_start") % c).cast("long").alias("offset"),
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.expr(f"(_last div {c}) - (_start div {c}) + 1"),
        )
        .otherwise(F.lit(1))
        .cast("long")
        .alias("n_seqs_spanned"),
    )


def pack_sequences_sql(
    table: str,
    ctx_len: int,
    id_col: str = "doc_id",
    tokens_expr: str = "n_tokens",
) -> str:
    """DuckDB twin: the ONE-WINDOW formulation the distributed version
    must reproduce bit-for-bit (same hash order, same integer math)."""
    h = md5_long_sql(f"CAST({id_col} AS VARCHAR)")
    return f"""
WITH t AS (SELECT {id_col} AS doc_id, CAST({tokens_expr} AS BIGINT) AS n_tokens,
                  {h} AS h FROM {table}),
c AS (SELECT doc_id, n_tokens, h,
             sum(n_tokens) OVER (ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
SELECT doc_id,
       CAST((cum - n_tokens) // {ctx_len} AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % {ctx_len} AS BIGINT) AS "offset",
       n_tokens,
       CAST(CASE WHEN n_tokens > 0
                 THEN (cum - 1) // {ctx_len} - (cum - n_tokens) // {ctx_len} + 1
                 ELSE 1 END AS BIGINT) AS n_seqs_spanned
FROM c
"""


def stratified_sample(
    docs: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    group_col: str | None = None,
    group_rates: dict | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    md5(seed || id) / 2^60 < rate — reproducible at any parallelism,
    no RNG state, and a resumable pipeline re-selects the identical
    rows.  ``group_rates`` overrides the rate per group (stratum
    re-weighting); unlisted groups fall back to ``rate``.  Group keys
    match on their STRING form (both the column and the dict keys are
    stringified) so the DuckDB oracle twin — which can only compare
    quoted literals — selects the identical rows for non-string group
    columns too."""
    u = md5_long(F.col(id_col).cast("string"), seed=seed) / F.lit(float(_HASH_SPAN))
    if group_col is not None and group_rates:
        r = F.coalesce(
            F.element_at(
                F.create_map(
                    *[
                        F.lit(x)
                        for g, v in group_rates.items()
                        for x in (str(g), float(v))
                    ]
                ),
                F.col(group_col).cast("string"),
            ),
            F.lit(float(rate)),
        )
    else:
        r = F.lit(float(rate))
    return docs.filter(u < r)


def stratified_sample_sql(
    table: str,
    rate: float,
    id_col: str = "doc_id",
    group_col: str | None = None,
    group_rates: dict | None = None,
    seed: int = 0,
) -> str:
    """DuckDB twin of stratified_sample's keep-predicate.  Group keys
    are single-quote-escaped and the group column is CAST to VARCHAR so
    a quote-bearing or non-string stratum key can't break or skew the
    oracle SQL (the Spark side's create_map lookup compares the same
    stringified values)."""
    h = md5_long_sql(f"CAST({id_col} AS VARCHAR)", seed=seed)
    if group_col is not None and group_rates:
        whens = " ".join(
            "WHEN CAST({c} AS VARCHAR) = '{g}' THEN {v!r}".format(
                c=group_col, g=str(g).replace("'", "''"), v=float(v)
            )
            for g, v in group_rates.items()
        )
        r = f"(CASE {whens} ELSE {float(rate)!r} END)"
    else:
        r = repr(float(rate))
    return f"SELECT * FROM {table} WHERE CAST({h} AS DOUBLE) / {float(_HASH_SPAN)!r} < {r}"
