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
) -> tuple[bytes, int, int]:
    """-> (bitmap bytes, m bits, k hashes) over the small side's keys.

    One mapInPandas pass builds a partial bitmap per partition; the
    driver ORs <= max_build_partitions partials.  Keys are hashed
    JVM-side with xxhash64, so any key type works and the probe hashes
    identically."""
    if n_keys is None:
        n_keys = small.count()
    m = max(64, 1 << int(np.ceil(np.log2(max(n_keys, 1) * bits_per_key))))
    k = n_hashes
    hashes = small.select(F.xxhash64(F.col(key_col)).alias("h"))
    if hashes.rdd.getNumPartitions() > max_build_partitions:
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
) -> DataFrame:
    """EXACT ``big SEMI JOIN small`` whose shuffle carries only the
    bloom survivors (true matches + ~0.8% false positives) instead of
    the whole big side.  -> big's rows/columns, exactly the plain semi
    join's output (oracle: the plain IN-subquery)."""
    skey = small_key_col or key_col
    bitmap_bytes, m, k = build_bloom(
        small, skey, n_keys=n_keys, bits_per_key=bits_per_key, n_hashes=n_hashes
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

    survivors = big.filter(might_contain(F.xxhash64(F.col(key_col))))
    keys = small.select(F.col(skey).alias(key_col)).distinct()
    return survivors.join(keys, key_col, "left_semi")
