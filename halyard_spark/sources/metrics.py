"""Dirty-parse skip metrics — the ParserPump failure-reporting analog
(tools/.../HalyardBulkLoad.java:321-482 logs every parse failure per
file; SURVEY §2.1 promises count-and-skip with a lineage metric).

The dirty-tolerant readers (Turtle/TriG, RDF/XML, JSON-LD, N-Triples)
drop malformed statements and unparseable files instead of failing the
job.  A ``ParseMetrics`` makes those drops visible: Python-side readers
add to Spark accumulators from inside their Arrow batches; the JVM-only
N-Triples path attaches a ``Dataset.observe`` metric (rides the same
job — no extra pass, no Python in the plan).  ``snapshot()`` is safe to
call any time: observations that never ran report 0 instead of blocking.

Accumulator caveat (documented, inherent to Spark): a retried task adds
twice, so counts are at-least-once metrics, not data.  At 100 TB that
is exactly what you want from a skip counter — a 3% silent drop shows
up as ~3% even if a few retries inflate it slightly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, SparkSession


class ParseMetrics:
    """Skip counters shared across one load's readers.

    - ``files_failed``: whole files that produced no rows (unparseable).
    - ``statements_skipped``: statements/lines dropped inside otherwise
      parseable files (Turtle resync, bad JSON-LD lines, malformed NT
      lines via observation).
    - ``files_skipped_unknown_ext``: paths a directory/glob expansion
      refused to route to a parser (driver-side; see rio.read_rdf).
    """

    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        self.files_failed = sc.accumulator(0)
        self.statements_skipped = sc.accumulator(0)
        self.files_skipped_unknown_ext: list[str] = []
        self._observations: list[Observation] = []

    def observe_lines_skipped(self, df: DataFrame, bad: Column) -> DataFrame:
        """Attach a JVM-side observed metric counting rows where ``bad``
        is true.  Returns the observed DataFrame (same rows)."""
        from pyspark.sql import functions as F

        obs = Observation()
        self._observations.append(obs)
        return df.observe(
            obs, F.coalesce(F.sum(bad.cast("long")), F.lit(0)).alias("lines_skipped")
        )

    def _observed_skips(self, timeout_s: float = 2.0) -> int:
        import time

        total = 0
        deadline = time.monotonic() + timeout_s
        for obs in self._observations:
            jo = getattr(obs, "_jo", None)
            if jo is None:
                continue
            # the metric lands on a listener thread shortly AFTER the
            # action returns — poll briefly; an observation whose action
            # never ran stays incomplete and reports 0 (obs.get would
            # block forever, so never call it unguarded)
            while not jo.future().isCompleted() and time.monotonic() < deadline:
                time.sleep(0.05)
            if jo.future().isCompleted():
                total += int(obs.get.get("lines_skipped", 0) or 0)
        return total

    def snapshot(self) -> dict:
        return {
            "files_failed": int(self.files_failed.value),
            "statements_skipped": int(self.statements_skipped.value)
            + self._observed_skips(),
            "files_skipped_unknown_ext": len(self.files_skipped_unknown_ext),
            "skipped_paths": sorted(self.files_skipped_unknown_ext)[:100],
        }
