"""Bloom-filter semi-join reduction — the classic 100 TB shuffle cut.

A semi join ``big SEMI JOIN small ON key`` normally shuffles the ENTIRE
big side on the key.  When the small side is too large to broadcast as
rows but its KEY SET fits a Bloom filter (10 bits/key: 10^8 keys ~=
125 MB), the scale plan is:

1. build a Bloom filter over the small side's keys DISTRIBUTEDLY
   (one partial bitmap per partition via mapInPandas, numpy bit ops),
2. OR-merge the partials on the driver and broadcast the bitmap,
3. pre-filter the big side with a vectorized Arrow probe — this is a
   map-side filter BEFORE any exchange, so the subsequent exact join
   shuffles only true matches + ~0.8% false positives,
4. finish with an exact semi join on the survivors, which removes the
   false positives — the operator's output is EXACTLY the plain semi
   join (the DuckDB oracle is the plain ``IN`` subquery).

Spark's own runtime bloom pushdown
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, on in the engine
conf bundle) does this automatically for some shuffle-join shapes; this
operator is the explicit, always-available form (the builtin
``bloom_filter_agg`` is not SQL-registered in this Spark build), and it
composes with any downstream plan because the probe is just a Filter.

Sizing: ``bits_per_key=10`` + ``n_hashes=7`` gives ~0.82% false
positives (k ~= ln2 * bits/key is optimal).  The driver OR-merge
collects one ``m/8``-byte partial per build-side partition — the build
side is coalesced to <= ``max_build_partitions`` so driver traffic is
bounded by ~64 x bitmap size.  Practical bitmap limit ~128 MB (~10^8
keys); beyond that, prefer bucketing both tables (see the bucketed-SMJ
plan-audit section) or Spark's runtime filter.

Double hashing (Kirsch-Mitzenmacher): position_i = (h1 + i*h2) mod m
over h = xxhash64(key), h1 = low bits, h2 = high bits forced odd —
k positions from one 64-bit hash, no per-hash rescan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401 — resolves pandas_udf type hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _norm_key(df: DataFrame, col: str) -> tuple[F.Column, str]:
    """Key column normalized to a canonical hash type.

    xxhash64 is TYPE-SENSITIVE: an int and a bigint that compare equal
    under the SQL join hash DIFFERENTLY, so building over one and
    probing with the other silently drops true matches (round-4 ADVICE).
    Integral keys hash as bigint, float as double; every other type
    hashes as-is and must match the other side exactly."""
    dt = dict(df.dtypes)[col]
    if dt in _INTEGRAL_TYPES:
        return F.col(col).cast("long"), "bigint"
    if dt in ("float", "double"):
        return F.col(col).cast("double"), "double"
    return F.col(col), dt


def stage_row_count(spark, root: str, stage: str) -> int:
    """Exact row count of a checkpointed stage from its LINEAGE metadata
    (plans/lineage.py) — no data scan, no count job over the table.
    The intended ``n_keys=`` source for bloom_semi_join when the small
    side is a pipeline stage: sizing then adds zero extra jobs."""
    from lazyosm_spark.plans.catalog import table_stats

    row = table_stats(spark, root, stage).agg(F.sum("row_count")).first()
    return int(row[0] or 0)


def _positions(h64: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n,) uint64 hashes -> (k, n) uint64 bit positions via double
    hashing.  m is kept a Python int (fits uint64 math)."""
    h = h64.view(np.uint64) if h64.dtype == np.int64 else h64.astype(np.uint64)
    h1 = h % np.uint64(m)
    h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd -> full-cycle stride
    return (
        h1[None, :] + np.arange(k, dtype=np.uint64)[:, None] * h2[None, :]
    ) % np.uint64(m)


def build_bloom(
    small: DataFrame,
    key_col: str,
    n_keys: int | None = None,
    bits_per_key: int = 10,
    n_hashes: int = 7,
    max_build_partitions: int = 64,
    max_bitmap_bytes: int = 128 << 20,
) -> tuple[bytes, int, int]:
    """-> (bitmap bytes, m bits, k hashes) over the small side's keys.

    One mapInPandas pass builds a partial bitmap per partition; the
    driver ORs <= max_build_partitions partials.  Keys are hashed
    JVM-side with xxhash64 after normalizing integral types to bigint
    (see _norm_key), so the probe side hashes identically even when
    the SQL-comparable key types differ in width.

    ``n_keys``: pass it when known to avoid the sizing count job —
    from ``stage_row_count`` (lineage metadata, zero extra jobs) for
    checkpointed stages, or any caller-side estimate; an OVERestimate
    only wastes bitmap bits, an underestimate only raises the FP rate
    (output stays exact either way).  Bitmaps over
    ``max_bitmap_bytes`` (default 128 MB ~ 10^8 keys) raise ValueError
    up front instead of failing late in the driver OR-merge — beyond
    that, bucket both tables or use Spark's runtime bloom filter."""
    if n_keys is None:
        n_keys = small.count()
    m = max(64, 1 << int(np.ceil(np.log2(max(n_keys, 1) * bits_per_key))))
    if m // 8 > max_bitmap_bytes:
        raise ValueError(
            f"bloom bitmap would be {m // 8} bytes for n_keys={n_keys} "
            f"(max_bitmap_bytes={max_bitmap_bytes}); the driver OR-merge "
            "collects up to max_build_partitions copies — bucket both "
            "tables or use Spark's runtime bloom filter instead"
        )
    k = n_hashes
    key_expr, _ = _norm_key(small, key_col)
    # coalesce never increases partition count, so this is a no-op on
    # already-small builds and bounds driver traffic on wide ones —
    # without touching .rdd for a partition-count probe
    hashes = small.select(F.xxhash64(key_expr).alias("h"))
    hashes = hashes.coalesce(max_build_partitions)

    def partial(batches):
        bitmap = np.zeros(m // 8, dtype=np.uint8)
        for pdf in batches:
            if len(pdf):
                pos = _positions(pdf["h"].to_numpy(np.int64), m, k).ravel()
                # np.bitwise_or.at: unbuffered -> duplicate bytes in one
                # batch still set all their bits
                bits = (1 << (pos & np.uint64(7)).astype(np.int64)).astype(np.uint8)
                np.bitwise_or.at(
                    bitmap, (pos >> np.uint64(3)).astype(np.int64), bits
                )
        yield pd.DataFrame({"bm": [bitmap.tobytes()]})

    parts = hashes.mapInPandas(partial, "bm binary").collect()
    bitmap = np.zeros(m // 8, dtype=np.uint8)
    for row in parts:
        bitmap |= np.frombuffer(row["bm"], dtype=np.uint8)
    return bitmap.tobytes(), m, k


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    small_key_col: str | None = None,
    n_keys: int | None = None,
    bits_per_key: int = 10,
    n_hashes: int = 7,
    max_bitmap_bytes: int = 128 << 20,
) -> DataFrame:
    """EXACT ``big SEMI JOIN small`` whose shuffle carries only the
    bloom survivors (true matches + ~0.8% false positives) instead of
    the whole big side.  -> big's rows/columns, exactly the plain semi
    join's output (oracle: the plain IN-subquery).

    Sizing without extra jobs: pass ``n_keys`` (e.g. from
    ``stage_row_count`` — lineage metadata, no scan) to skip the
    build-side count; the build also never touches ``.rdd``.  Key
    columns whose normalized hash types differ (see _norm_key: integral
    -> bigint, float -> double) raise ValueError — hashing them
    independently would silently drop true matches."""
    skey = small_key_col or key_col
    big_expr, big_t = _norm_key(big, key_col)
    _, small_t = _norm_key(small, skey)
    if big_t != small_t:
        raise ValueError(
            f"bloom_semi_join key types diverge after normalization: "
            f"big.{key_col} hashes as {big_t}, small.{skey} as {small_t}; "
            "cast one side so the bloom build and probe hash identically"
        )
    bitmap_bytes, m, k = build_bloom(
        small,
        skey,
        n_keys=n_keys,
        bits_per_key=bits_per_key,
        n_hashes=n_hashes,
        max_bitmap_bytes=max_bitmap_bytes,
    )
    sc = big.sparkSession.sparkContext
    bc = sc.broadcast(np.frombuffer(bitmap_bytes, dtype=np.uint8))

    @F.pandas_udf("boolean")
    def might_contain(h: pd.Series) -> pd.Series:
        bm = bc.value
        pos = _positions(h.to_numpy(np.int64), m, k)
        hit = np.ones(pos.shape[1], dtype=bool)
        for i in range(k):
            p = pos[i]
            byte = bm[(p >> np.uint64(3)).astype(np.int64)]
            bit = (byte >> (p & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
            hit &= bit.astype(bool)
        return pd.Series(hit)

    survivors = big.filter(might_contain(F.xxhash64(big_expr)))
    keys = small.select(F.col(skey).alias(key_col)).distinct()
    return survivors.join(keys, key_col, "left_semi")
