"""File-format readers (SURVEY.md §2.1 scan surface).

Spark-first re-expressions of the reference's input formats:

- S1  csv_with_dialect: per-table sep / skiprows / header
- S2  csv_all_string: dtype=str, no NA coercion
- S4  tsv_hash_header: eggNOG-style '#query' header + '##' comments
- S5  gff3: tab table + attributes column -> map
- S6  fasta: defline-grouped sequences
- S8  keyed_json: row-oriented keyed dicts

Everything returns a DataFrame; no pandas on the read path (the
reference's pd.read_csv per-file loop becomes one distributed scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def csv_with_dialect(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    skiprows: int = 0,
    header: bool = True,
    comment: str | None = None,
) -> DataFrame:
    """S1 (omics_adapter.py:677-684): CSV with per-table dialect.

    skiprows is implemented by filtering on a per-file line index
    (monotonically increasing within partition order of spark.read.text)
    before parsing — the distributed analog of pandas skiprows.
    """
    if skiprows:
        lines = spark.read.text(path)
        w = Window.orderBy(F.monotonically_increasing_id())
        lines = (
            lines.withColumn("_i", F.row_number().over(w))
            .where(F.col("_i") > skiprows)
            .drop("_i")
        )
        reader = spark.read.option("sep", sep).option("header", str(header).lower())
        if comment:
            reader = reader.option("comment", comment)
        return reader.csv(lines.rdd.map(lambda r: r.value))
    reader = (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
        .option("inferSchema", "false")
    )
    if comment:
        reader = reader.option("comment", comment)
    return reader.csv(path)


def csv_all_string(spark: SparkSession, path: str, sep: str = ",") -> DataFrame:
    """S2 (metabolite_assay_adapter.py:303): all-string, keep '' as ''
    (no NA coercion)."""
    return (
        spark.read.option("sep", sep)
        .option("header", "true")
        .option("inferSchema", "false")
        .option("nullValue", "\u0000unused")  # no token maps to null
        .csv(path)
    )


def tsv_hash_header(spark: SparkSession, path: str) -> DataFrame:
    """S4 (gene_annotations_config.yaml:47-55): TSV whose header line
    starts '#query...' and whose '##' lines are comments."""
    lines = spark.read.text(path).where(~F.col("value").startswith("##"))
    header = lines.where(F.col("value").startswith("#")).limit(1).collect()
    cols = header[0].value.lstrip("#").split("\t") if header else None
    body = lines.where(~F.col("value").startswith("#"))
    parts = F.split("value", "\t")
    if cols is None:
        return body.select(parts.alias("fields"))
    return body.select(
        *[parts.getItem(i).alias(c.strip()) for i, c in enumerate(cols)]
    )


GFF3_SCHEMA = T.StructType(
    [
        T.StructField("seqid", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("score", T.StringType()),
        T.StructField("strand", T.StringType()),
        T.StructField("phase", T.StringType()),
        T.StructField("attributes", T.StringType()),
    ]
)


def gff3(spark: SparkSession, path: str) -> DataFrame:
    """S5 (build_gene_mapping.py:74-79): GFF3 -> columns + attributes
    map (the attributes_to_columns analog: str_to_map + url_decode)."""
    df = (
        spark.read.option("sep", "\t")
        .option("comment", "#")
        .schema(GFF3_SCHEMA)
        .csv(path)
    )
    attrs = F.transform_values(
        F.str_to_map(F.col("attributes"), F.lit(";"), F.lit("=")),
        lambda k, v: F.url_decode(v),
    )
    return df.withColumn("attrs", attrs)


def fasta(spark: SparkSession, path: str) -> DataFrame:
    """S6 (cyanorak_ncbi_adapter.py:94-119): FASTA -> (accession,
    description, sequence). Records are grouped by a running count of
    deflines (native window, no Python)."""
    lines = spark.read.text(path).withColumn(
        "_i", F.monotonically_increasing_id()
    )
    w = Window.orderBy("_i").rowsBetween(Window.unboundedPreceding, 0)
    grouped = lines.withColumn(
        "rec", F.sum(F.when(F.col("value").startswith(">"), 1).otherwise(0)).over(w)
    )
    return (
        grouped.groupBy("rec")
        .agg(
            F.min(F.when(F.col("value").startswith(">"), F.col("value"))).alias(
                "defline"
            ),
            F.concat_ws(
                "",
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("value").startswith(">"),
                            F.struct("_i", "value"),
                        )
                    )
                ).getField("value"),
            ).alias("sequence"),
        )
        .where(F.col("defline").isNotNull())
        .select(
            F.regexp_extract("defline", r"^>(\S+)", 1).alias("accession"),
            F.regexp_extract("defline", r"^>\S+\s*(.*)$", 1).alias("description"),
            "sequence",
        )
    )


def keyed_json(spark: SparkSession, path: str, key_name: str = "key") -> DataFrame:
    """S8 (cyanorak_ncbi_adapter.py:265-273): {key -> row-dict} JSON
    -> one row per key. Reads the object with each key as a column,
    then unpivots via stack of struct columns."""
    df = spark.read.option("multiLine", "true").json(path)
    cols = df.columns
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias(key_name), F.col(c).alias("value"))
                    for c in cols
                ]
            )
        ).alias("kv")
    )
    return stacked.select(f"kv.{key_name}", "kv.value.*")
