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

    skiprows (the pandas analog) drops the first N lines of EACH
    file via a window partitioned by input_file_name — parallel
    across files, no global single-partition sort, and the parse is
    native ``from_csv`` (all-string schema derived from the header) —
    zero Python round-trips on the line stream.

    CONTRACT (skiprows path): line numbering is per FILE, so each
    file is one window task — parallel across many paper supp tables
    (the reference's workload, omics_adapter.py:677-684), but a
    single multi-GB CSV would serialize into one task. For big
    headerless-prefix files, strip the prefix at ingest instead.
    The header line is parsed with the same quote/escape rules as
    the body (csv.reader, not a naive split).
    """
    if skiprows:
        if not header:
            raise ValueError("skiprows without header is not supported")
        lines = spark.read.text(path).select(
            "value",
            F.input_file_name().alias("_f"),
            F.monotonically_increasing_id().alias("_i"),
        )
        w = Window.partitionBy("_f").orderBy("_i")
        body = lines.withColumn("_r", F.row_number().over(w)).where(
            F.col("_r") > skiprows
        )
        if comment:
            body = body.where(~F.col("value").startswith(comment))
        # header = the first SURVIVING line per file (comment lines at
        # or before the header position must not shift data rows into
        # the header slot): re-number the filtered stream per file
        body = body.withColumn("_r2", F.row_number().over(w))
        first = body.where(F.col("_r2") == 1).select("value").limit(1).collect()
        if not first:
            raise ValueError(
                f"{path}: no header line survives skiprows={skiprows}/comment filter"
            )
        import csv as _csv
        import io as _io

        cols = [
            c.strip()
            for c in next(_csv.reader(_io.StringIO(first[0].value), delimiter=sep))
        ]
        ddl = ", ".join(f"`{c}` string" for c in cols)
        data = body.where(F.col("_r2") > 1)
        return data.select(
            F.from_csv(F.col("value"), ddl, {"sep": sep}).alias("row")
        ).select("row.*")
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
    description, sequence).

    Scale path: ``lineSep='>'`` makes each FASTA record ONE text row
    (Hadoop's record reader splits on the delimiter, so even a single
    multi-GB file reads in parallel splits) — no global window, no
    running-count shuffle, no Python. Per record: first line is the
    defline, the rest joins into the sequence. Assumes '>' appears
    only as the record delimiter (standard FASTA)."""
    recs = spark.read.option("lineSep", ">").text(path)
    recs = recs.where(F.trim(F.col("value")) != "")
    lines = F.split(F.regexp_replace(F.col("value"), "\r", ""), "\n")
    defline = lines.getItem(0)
    seq = F.array_join(F.slice(lines, 2, 2147483646), "")
    return recs.select(
        F.regexp_extract(defline, r"^(\S+)", 1).alias("accession"),
        F.regexp_extract(defline, r"^\S+\s*(.*)$", 1).alias("description"),
        seq.alias("sequence"),
    )


def genbank_cds(spark: SparkSession, path: str) -> DataFrame:
    """S7 (build_gene_mapping.py:127-185): GenBank flat-file scan ->
    one row per CDS feature with the qualifiers the reference reads:

    -> (record_id, locus_tags array<string>, ec_numbers array<string>,
        cyanorak_id string|null)

    Native record parsing, no Biopython: records split on the '//'
    terminator (splittable read — a multi-GB GBFF parallelizes),
    CDS feature blocks via multiline regex (feature header at 5-space
    indent, qualifier lines at 21), wrapped qualifier values unwrapped
    before extraction. The 'cyanorak ORF Id:' note handling mirrors
    _get_cyanorak_id (first matching note, prefix stripped — anchored,
    so the phrase appearing mid-note is not deleted).
    Records split on the line-anchored terminator '\\n//', so '//'
    inside REFERENCE/REMARK text (e.g. an 'http://...' URL) cannot
    break a record.
    """
    recs = spark.read.option("lineSep", "\n//").text(path)
    recs = recs.where(F.col("value").rlike(r"(?m)^LOCUS\s"))
    record_id = F.regexp_extract(F.col("value"), r"(?m)^LOCUS\s+(\S+)", 1)
    blocks = F.regexp_extract_all(
        F.col("value"), F.lit(r"(?m)^ {5}CDS\b.*(?:\n {21}.*)*"), 0
    )
    per_cds = recs.select(
        record_id.alias("record_id"), F.explode(blocks).alias("block")
    )
    # join 21-space continuation lines that do NOT start a new
    # /qualifier back onto the previous line (wrapped values)
    unwrapped = F.regexp_replace(F.col("block"), r"\n {21}(?!/)", " ")
    notes = F.regexp_extract_all(unwrapped, F.lit(r'/note="([^"]*)"'), 1)
    cyan_notes = F.filter(notes, lambda n: n.startswith("cyanorak ORF Id:"))
    cyanorak_id = F.when(
        F.size(cyan_notes) > 0,
        F.trim(
            F.regexp_replace(cyan_notes.getItem(0), r"^cyanorak ORF Id:\s*", "")
        ),
    )
    return per_cds.select(
        "record_id",
        F.regexp_extract_all(unwrapped, F.lit(r'/locus_tag="([^"]+)"'), 1).alias(
            "locus_tags"
        ),
        F.regexp_extract_all(unwrapped, F.lit(r'/EC_number="([^"]+)"'), 1).alias(
            "ec_numbers"
        ),
        cyanorak_id.alias("cyanorak_id"),
    )


def genbank_ec_by_locus(cds: DataFrame) -> DataFrame:
    """_get_ec_numbers_from_gbff (build_gene_mapping.py:142-165):
    locus_tag -> all EC numbers across its CDS features."""
    return (
        cds.where(F.size("ec_numbers") > 0)
        .select(F.explode("locus_tags").alias("locus_tag"), "ec_numbers")
        .groupBy("locus_tag")
        .agg(F.flatten(F.collect_list("ec_numbers")).alias("ec_numbers"))
    )


def genbank_cyanorak_map(cds: DataFrame) -> DataFrame:
    """_get_cyanorak_id_map_from_gbk (build_gene_mapping.py:127-139):
    cyanorak_id -> locus_tag (last locus_tag wins in the reference's
    dict insertion; here: max for determinism)."""
    return (
        cds.where(F.col("cyanorak_id").isNotNull())
        .select("cyanorak_id", F.explode("locus_tags").alias("locus_tag"))
        .groupBy("cyanorak_id")
        .agg(F.max("locus_tag").alias("locus_tag"))
    )


def keyed_json(
    spark: SparkSession,
    path: str,
    key_name: str = "key",
    value_schema: str = "map<string,string>",
) -> DataFrame:
    """S8 (cyanorak_ncbi_adapter.py:265-273): {key -> row-dict} JSON
    -> one row per key, via ``from_json`` into a MapType + explode.

    A 20K-key mapping JSON (reference scale, gene_id_utils.py:275)
    stays ONE map value per document — never 20K planner columns.
    ``value_schema`` is the DDL type of each entry's value (default:
    string map; pass e.g. 'struct<name:string,ec:array<string>>' for
    typed access)."""
    raw = spark.read.text(path, wholetext=True)
    m = F.from_json(F.col("value"), f"map<string,{value_schema}>")
    return raw.select(F.explode(m).alias(key_name, "value"))
