"""J8: declarative config-driven multi-source merge.

Re-expresses the reference's AnnotationBuilder.build_merged
(/root/reference/multiomics_kg/download/build_gene_annotations.py:446-864
driven by /root/reference/config/gene_annotations_config.yaml:25-120):
an anchor table left-joined with N sources, then per-field merge
rules decide how candidate columns combine:

    passthrough       first source that has the field
    single            priority coalesce across sources
    union             distinct token union across (array) sources
    integer / float   coalesce + cast
    concat            ' :: '-joined composition (gene_summary, F16)

Each rule is one native expression; the whole merge is a chain of
(broadcastable) left joins + one select — Catalyst prunes unused
source columns per field automatically.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class SourceSpec:
    name: str
    df: DataFrame
    join_on: str  # anchor column name == source column name
    pivot_explode: str | None = None  # J9: explode this array col first
    broadcast: bool = True


@dataclass
class FieldRule:
    name: str
    rule: str  # passthrough | single | union | integer | float | concat
    sources: list[str] = field(default_factory=list)  # '<src>.<col>' priority order
    sep: str = " :: "


def _src_col(ref: str) -> str:
    """'src.col' -> prefixed physical name; 'anchor.col' -> bare col."""
    if ref.startswith("anchor."):
        return ref.split(".", 1)[1]
    return ref.replace(".", "__")


def merge_sources(
    anchor: DataFrame, sources: list[SourceSpec], rules: list[FieldRule]
) -> DataFrame:
    """anchor ⟕ source1 ⟕ source2 ... -> one row per anchor key with
    rule-merged fields."""
    out = anchor
    for s in sources:
        df = s.df
        if s.pivot_explode:
            df = df.withColumn(s.pivot_explode, F.explode(s.pivot_explode))
        # prefix source columns to avoid collisions
        renamed = df.select(
            F.col(s.pivot_explode or s.join_on).alias(f"__k_{s.name}"),
            *[
                F.col(c).alias(f"{s.name}__{c}")
                for c in df.columns
                if c != (s.pivot_explode or s.join_on)
            ],
        ).dropDuplicates([f"__k_{s.name}"])
        j = F.broadcast(renamed) if s.broadcast else renamed
        out = out.join(j, out[s.join_on] == renamed[f"__k_{s.name}"], "left").drop(
            f"__k_{s.name}"
        )

    cols = [out[c] for c in anchor.columns]
    for r in rules:
        refs = [F.col(_src_col(x)) for x in r.sources]
        if r.rule in ("passthrough", "single"):
            expr = F.coalesce(*refs)
        elif r.rule == "integer":
            expr = F.coalesce(*[c.cast("long") for c in refs])
        elif r.rule == "float":
            expr = F.coalesce(*[c.cast("double") for c in refs])
        elif r.rule == "union":
            arrs = [
                F.coalesce(c, F.array().cast("array<string>")) for c in refs
            ]
            acc = arrs[0]
            for a in arrs[1:]:
                acc = F.array_union(acc, a)
            expr = F.array_sort(F.array_distinct(acc))
        elif r.rule == "concat":
            expr = F.concat_ws(r.sep, *refs)
        else:
            raise ValueError(f"unknown merge rule {r.rule!r}")
        cols.append(expr.alias(r.name))
    return out.select(*cols)


def merge_gene_cds(
    gff: DataFrame, attrs_col: str = "attrs", decode_locus_tag: bool = False
) -> DataFrame:
    """J7 (ncbi_merge_cds_and_gene_entries,
    build_gene_mapping.py:81-110): self-merge of a GFF3 scan — gene
    rows join CDS rows on gene.attrs['ID'] == cds.attrs['Parent'],
    every column suffixed _gene/_cds (pandas merge suffixes), plus
    the reference's locus_tag hygiene: the (possibly multi-valued)
    locus_tag is kept whole as old_locus_tags.

    ``decode_locus_tag`` applies the reference's URL-decode
    ('PMT0003%2CPMT_0003' -> 'PMT0003,PMT_0003') — pass True ONLY
    for raw/encoded attrs; ``sources.readers.gff3`` already decodes
    every attribute value, and decoding twice corrupts tags that
    legitimately contain '%' or '+'.

    One equi-join keyed by the attribute value; both sides come from
    the same scan (Catalyst reuses the exchange under AQE).
    """
    gene = gff.where(F.col("type") == "gene").select(
        *[F.col(c).alias(f"{c}_gene") for c in gff.columns]
    )
    cds = gff.where(F.col("type") == "CDS").select(
        *[F.col(c).alias(f"{c}_cds") for c in gff.columns]
    )
    j = gene.join(
        cds,
        F.col(f"{attrs_col}_gene").getItem("ID")
        == F.col(f"{attrs_col}_cds").getItem("Parent"),
    )
    lt = F.col(f"{attrs_col}_gene").getItem("locus_tag")
    if decode_locus_tag:
        lt = F.url_decode(lt)
    return j.withColumn("locus_tag", lt).withColumn("old_locus_tags", lt)
