"""Deterministic corpus sampling — training-data pipeline building block.

At 100 TB a training mix is drawn as "p% of stratum X, q% of stratum Y"
over petabyte slices.  `rand()`-based sampling is neither reproducible
nor partition-stable; the scalable form is CONTENT-HASH Bernoulli
sampling: keep a row iff the first 8 hex digits of md5(salt || id)
fall below a per-stratum threshold.  Properties that matter at scale:

- deterministic and engine-portable (md5 of the id, not Spark-internal
  xxhash64) — the identical sample falls out on any cluster size,
  any partitioning, any engine (the DuckDB oracle replays it exactly);
- a pure narrow filter: no shuffle, pushes behind column pruning, and
  composes with partition pruning on the stratum column;
- monotone in rate: raising a stratum's rate strictly grows its sample
  (the kept set at 5% is a subset of the kept set at 10%), so mix
  rebalancing never churns previously selected documents;
- salt isolates independent draws (different salts give independent
  samples for held-out splits).

There is no reference analog (Halyard has no sampler); this is part of
the beyond-reference training-data surface the engine targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8  # first 8 md5 hex digits


def _rate_threshold(rate: float) -> str:
    """Sampling rate -> 8-hex-digit lexicographic threshold.

    rate >= 1.0 returns a sentinel that sorts after every hex digest
    ('g' > 'f'), so `hash_key < threshold` is a tautology and
    'keep everything' is exactly expressible (monotone through 1.0)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1]; got {rate}")
    if rate >= 1.0:
        return "g"
    return format(min(int(rate * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def _hash_key(id_col: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 8)


def hash_sample(
    docs: DataFrame, rate: float, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Uniform deterministic Bernoulli sample at `rate`."""
    return docs.where(_hash_key(F.col(id_col), salt) < F.lit(_rate_threshold(rate)))


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling: `rates` maps stratum value ->
    keep probability; strata not listed get `default_rate`."""
    thr = F.lit(_rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(_rate_threshold(rate))).otherwise(thr)
    return docs.where(_hash_key(F.col(id_col), salt) < thr)
