"""J6 — the reference's position-fallback interval merge.

Re-expresses build_gene_mapping's genomic-coordinate matcher
(/root/reference/multiomics_kg/download/build_gene_mapping.py:186-294):
match records from two annotation sources by same strand, reciprocal
overlap >= 0.9, |delta-start| <= 50, |delta-end| <= 3, keeping only
1:1 matches (any record matching twice is a conflict and is skipped,
:253-276).

Physical strategy (the generic range-join recipe): bucketize the
start coordinate at a width >= max interval length + slack, equi-join
on (strand, bucket) with side A exploded into the two candidate
buckets, then apply the exact predicates residually — a hash join
plus filter instead of a per-strand cross product. Spark's range-join
hints can replace the manual bucketing on Databricks-flavored
runtimes; this form is engine-pure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def position_fallback_merge(
    a: DataFrame,
    b: DataFrame,
    bucket_width: int = 1000,
    max_dstart: int = 50,
    max_dend: int = 3,
    min_reciprocal_overlap: float = 0.9,
) -> DataFrame:
    """a(a_id, strand, a_start, a_end) x b(b_id, strand, b_start, b_end)
    -> 1:1 matches (a_id, b_id, overlap_len).
    """
    aa = a.select(
        "a_id",
        F.col("strand").alias("a_strand"),
        "a_start",
        "a_end",
        # b_start may land in the bucket below (negative jitter) or
        # above (interval spill): probe all three
        F.explode(
            F.array(
                (F.col("a_start") / bucket_width).cast("long") - 1,
                (F.col("a_start") / bucket_width).cast("long"),
                (F.col("a_start") / bucket_width).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    bb = b.select(
        "b_id",
        F.col("strand").alias("b_strand"),
        "b_start",
        "b_end",
        (F.col("b_start") / bucket_width).cast("long").alias("bucket"),
    )
    overlap = F.least("a_end", "b_end") - F.greatest("a_start", "b_start") + 1
    len_a = F.col("a_end") - F.col("a_start") + 1
    len_b = F.col("b_end") - F.col("b_start") + 1
    cand = (
        aa.join(bb, "bucket")
        .where(
            (F.col("a_strand") == F.col("b_strand"))
            & (F.abs(F.col("a_start") - F.col("b_start")) <= max_dstart)
            & (F.abs(F.col("a_end") - F.col("b_end")) <= max_dend)
            & (overlap >= min_reciprocal_overlap * len_a)
            & (overlap >= min_reciprocal_overlap * len_b)
        )
        .select("a_id", "b_id", overlap.alias("overlap_len"))
        .distinct()
    )
    # 1:1 only — conflicts skipped (reference :253-276)
    wa = Window.partitionBy("a_id")
    wb = Window.partitionBy("b_id")
    return (
        cand.withColumn("na", F.count(F.lit(1)).over(wa))
        .withColumn("nb", F.count(F.lit(1)).over(wb))
        .where((F.col("na") == 1) & (F.col("nb") == 1))
        .select("a_id", "b_id", "overlap_len")
    )
