"""Schema registry: declarative YAML -> typed StructTypes.

Re-expresses the reference's schema_config.yaml contract
(/root/reference/config/schema_config.yaml, 1,440 lines: 30 node
types + 77 edge types, each with represented_as / preferred_id /
label_in_input and a typed properties block) as a compiler from the
same YAML shape to pyspark StructTypes + typed emission helpers.

Type grammar (SURVEY.md §1.2, verbatim from the reference):
    str, str[], int, int[], float, float[]
    booleans are string enums "true"|"false" (Neo4j CSV convention,
    schema_config.yaml:148-149 — kept for triple parity).

Node emission contract: (node_id, label, props struct); edge:
(edge_id, subj, pred, obj, props struct) — the adapter 3-/5-tuples
(omics_adapter.py:315, :843-850) as DataFrame rows. Output tables
are partitioned by label / pred.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:
    import yaml

    _HAVE_YAML = True
except ImportError:  # pragma: no cover
    _HAVE_YAML = False

_TYPE_MAP: dict[str, T.DataType] = {
    "str": T.StringType(),
    "int": T.LongType(),
    "float": T.DoubleType(),
    "str[]": T.ArrayType(T.StringType()),
    "int[]": T.ArrayType(T.LongType()),
    "float[]": T.ArrayType(T.DoubleType()),
    # alternate list spelling used by the reference's metabolite
    # node (schema_config.yaml pathway_ids/pathway_names/
    # organism_names: list[str])
    "list[str]": T.ArrayType(T.StringType()),
    "list[int]": T.ArrayType(T.LongType()),
    "list[float]": T.ArrayType(T.DoubleType()),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}


def parse_type(decl: str) -> T.DataType:
    """'str'/'int[]'/... -> Spark type. Comments after '#' ignored
    (the reference annotates enums that way: `str # "true"|"false"`)."""
    base = decl.split("#")[0].strip()
    if base not in _TYPE_MAP:
        raise ValueError(f"unknown property type {decl!r}")
    return _TYPE_MAP[base]


@dataclass
class EntityType:
    label: str
    represented_as: str  # 'node' | 'edge'
    preferred_id: str | None = None
    input_label: str | None = None
    properties: dict[str, T.DataType] = field(default_factory=dict)

    def props_struct(self) -> T.StructType:
        return T.StructType(
            [T.StructField(k, v, True) for k, v in sorted(self.properties.items())]
        )

    def row_schema(self) -> T.StructType:
        base = (
            [
                T.StructField("node_id", T.StringType(), False),
                T.StructField("label", T.StringType(), False),
            ]
            if self.represented_as == "node"
            else [
                T.StructField("edge_id", T.StringType(), False),
                T.StructField("subj", T.StringType(), False),
                T.StructField("pred", T.StringType(), False),
                T.StructField("obj", T.StringType(), False),
            ]
        )
        return T.StructType(base + [T.StructField("props", self.props_struct(), True)])


class SchemaRegistry:
    """Parsed schema config: label -> EntityType."""

    def __init__(self, entities: dict[str, EntityType]):
        self.entities = entities

    @classmethod
    def from_dict(cls, cfg: dict) -> "SchemaRegistry":
        out: dict[str, EntityType] = {}
        for label, spec in cfg.items():
            if not isinstance(spec, dict) or "represented_as" not in spec:
                continue
            props = {
                k: parse_type(str(v)) for k, v in (spec.get("properties") or {}).items()
            }
            out[label] = EntityType(
                label=label,
                represented_as=str(spec["represented_as"]),
                preferred_id=spec.get("preferred_id"),
                input_label=spec.get("label_in_input"),
                properties=props,
            )
        return cls(out)

    @classmethod
    def from_yaml(cls, path_or_text: str) -> "SchemaRegistry":
        if not _HAVE_YAML:  # pragma: no cover
            raise RuntimeError("pyyaml not available")
        text = path_or_text
        if "\n" not in path_or_text:
            with open(path_or_text) as f:
                text = f.read()
        return cls.from_dict(yaml.safe_load(text))

    def node_labels(self) -> list[str]:
        return sorted(
            k for k, v in self.entities.items() if v.represented_as == "node"
        )

    def edge_labels(self) -> list[str]:
        return sorted(
            k for k, v in self.entities.items() if v.represented_as == "edge"
        )

    def emit_nodes(
        self, df: DataFrame, label: str, id_col: Column, prop_cols: dict[str, Column]
    ) -> DataFrame:
        """Typed node emission: validates+casts props against the
        declared schema, drops duplicates by id (U2), normalizes the
        CURIE id. Unknown property names are a hard error (the
        reference's schema discipline)."""
        ent = self.entities[label]
        unknown = set(prop_cols) - set(ent.properties)
        if unknown:
            raise ValueError(f"{label}: undeclared properties {sorted(unknown)}")
        struct = F.struct(
            *[
                prop_cols[name].cast(ent.properties[name]).alias(name)
                if name in prop_cols
                else F.lit(None).cast(ent.properties[name]).alias(name)
                for name in sorted(ent.properties)
            ]
        )
        return (
            df.select(
                id_col.cast("string").alias("node_id"),
                F.lit(label).alias("label"),
                struct.alias("props"),
            )
            .where(F.col("node_id").isNotNull())
            .dropDuplicates(["node_id"])
        )

    def emit_edges(
        self,
        df: DataFrame,
        label: str,
        subj: Column,
        obj: Column,
        prop_cols: dict[str, Column],
    ) -> DataFrame:
        """Typed edge emission with deterministic edge ids (F20)."""
        ent = self.entities[label]
        unknown = set(prop_cols) - set(ent.properties)
        if unknown:
            raise ValueError(f"{label}: undeclared properties {sorted(unknown)}")
        struct = F.struct(
            *[
                prop_cols[name].cast(ent.properties[name]).alias(name)
                if name in prop_cols
                else F.lit(None).cast(ent.properties[name]).alias(name)
                for name in sorted(ent.properties)
            ]
        )
        s, o = subj.cast("string"), obj.cast("string")
        return (
            df.select(
                F.concat_ws("|", s, F.lit(label), o).alias("edge_id"),
                s.alias("subj"),
                F.lit(label).alias("pred"),
                o.alias("obj"),
                struct.alias("props"),
            )
            .where(F.col("subj").isNotNull() & F.col("obj").isNotNull())
            .dropDuplicates(["edge_id"])
        )


# the webtext-KG schema (the target's schema_config.yaml)
DEFAULT_SCHEMA_YAML = """
page:
  represented_as: node
  preferred_id: url
  label_in_input: pages
  properties:
    url: str
    warc_ts: timestamp
    lang: str
    n_tokens: int
entity:
  represented_as: node
  preferred_id: curie
  label_in_input: vocab
  properties:
    surface_forms: str[]
    vocab: str
    tier: int
    mention_count: int
    doc_count: int
    rank_by_metric: int
    metric_percentile: float
    metric_bucket: str
    is_conflict: str  # "true" | "false"
mentions:
  represented_as: edge
  properties:
    n_occurrences: int
    positions: int[]
    resolution_method: str
same_as_canonical:
  represented_as: edge
  properties:
    source: str
"""


def default_registry() -> SchemaRegistry:
    return SchemaRegistry.from_yaml(DEFAULT_SCHEMA_YAML)
