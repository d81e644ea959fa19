"""Property-based parity: the native Column implementations of the
reference's row-level functions agree with straight-Python mirrors of
the reference semantics (gene_id_utils.py / paperconfig_utils.py) on
arbitrary inputs — not just the curated examples.

Alphabet note: cell values come from TSV/CSV tables, so tabs/newlines
cannot appear in them; generation therefore excludes them (Python
str.strip also trims \\t while SQL trim is space-only — a difference
unreachable through the file formats)."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions import candidates as cg
from multiomics_biocypher_kg_spark.functions.omics import parse_timepoint_hours

CELL_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 ,;()*+._-:|"
cells = st.text(alphabet=CELL_ALPHABET, min_size=0, max_size=40)


# -- straight-Python mirrors of the reference semantics ---------------


def py_expand_list(raw_val: str) -> list[str]:
    raw_val = str(raw_val).strip()
    if not raw_val or raw_val.lower() in ("nan", ""):
        return []
    out = [raw_val]
    if "," in raw_val or ";" in raw_val:
        for part in re.split(r"[,;]", raw_val):
            part = part.strip()
            if part and part not in out:
                out.append(part)
    if "(" in raw_val or " " in raw_val:
        for tok in re.findall(r"[\w.*:_-]+", raw_val):
            if tok and tok not in out:
                out.append(tok)
    return out


def py_heuristic(raw_val: str) -> list[str]:
    out: list[str] = []
    stripped = raw_val.rstrip("*+").strip()
    if stripped and stripped != raw_val:
        out.append(stripped)
    if "." not in raw_val and re.match(r"^[A-Z]{3}\d{5,}$", raw_val):
        out.append(raw_val + ".1")
    return out


def py_timepoint(tp: str | None) -> float | None:
    if not tp:
        return None
    tp = tp.strip()
    if not tp:
        return None
    if tp.lower().startswith("days ") and "+" in tp:
        return None
    if tp.startswith("R ") or tp == "R":
        return None
    if "extended darkness" in tp and "(" in tp:
        m = re.search(r"\((\d+(?:\.\d+)?)h\)", tp)
        return float(m.group(1)) if m else None
    if tp.lower().startswith("day "):
        m = re.match(r"[Dd]ay\s+(\d+(?:\.\d+)?)", tp)
        return float(m.group(1)) * 24 if m else None
    m = re.match(r"(-?\d+(?:\.\d+)?)\s*h", tp)
    return float(m.group(1)) if m else None


def _spark_eval(spark, col_fn, values):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, v string")
    rows = df.select("i", col_fn(F.col("v")).alias("out")).collect()
    return [r.out for r in sorted(rows, key=lambda r: r.i)]


@settings(max_examples=20, deadline=None)
@given(st.lists(cells, min_size=1, max_size=40))
def test_expand_list_matches_python_mirror(spark, batch):
    got = _spark_eval(spark, cg.expand_list, batch)
    want = [py_expand_list(v) for v in batch]
    assert got == want, [(v, g, w) for v, g, w in zip(batch, got, want) if g != w][:3]


@settings(max_examples=20, deadline=None)
@given(st.lists(cells, min_size=1, max_size=40))
def test_heuristic_variants_match_python_mirror(spark, batch):
    # the reference applies heuristics to already-trimmed candidates
    batch = [v.strip() for v in batch if v.strip()]
    if not batch:
        return
    got = _spark_eval(spark, cg.heuristic_variants, batch)
    want = [py_heuristic(v) for v in batch]
    assert got == want, [(v, g, w) for v, g, w in zip(batch, got, want) if g != w][:3]


def py_ncbi_defline(value: str) -> list[str]:
    return re.findall(
        r"gi\|\d+\|(?:ref|gb|emb|dbj|sp|tpg|tpe|tpd|prf|pir|pdb)\|(\S+?)\|", value
    )


deflines = st.one_of(
    cells,
    st.builds(
        lambda gi, src, acc, desc: f"gi|{gi}|{src}|{acc}.1| {desc}",
        st.integers(1, 10**9),
        st.sampled_from(["ref", "gb", "emb", "sp", "pdb", "xx"]),
        st.text(alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_", min_size=1, max_size=12),
        cells,
    ),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(deflines, min_size=1, max_size=40))
def test_ncbi_defline_matches_python_mirror(spark, batch):
    got = _spark_eval(spark, cg.ncbi_defline_tokens, batch)
    got_tokens = [[t.token for t in row] for row in got]
    want = [py_ncbi_defline(v) for v in batch]
    assert got_tokens == want, [
        (v, g, w) for v, g, w in zip(batch, got_tokens, want) if g != w
    ][:3]


def py_formula_elements(f: str | None) -> list[str]:
    if not f or not re.match(r"^([A-Z][a-z]?\d*|\(|\)\d*|\.\d*)+$", f):
        return []
    return sorted(set(re.findall(r"([A-Z][a-z]?)\d*", f)))


formulas = st.one_of(
    cells,
    st.builds(
        lambda parts: "".join(parts),
        st.lists(
            st.builds(
                lambda el, n: f"{el}{n if n > 1 else ''}",
                st.sampled_from(["C", "H", "O", "N", "P", "S", "Cu", "Fe", "Na"]),
                st.integers(1, 40),
            ),
            min_size=1,
            max_size=6,
        ),
    ),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(formulas, min_size=1, max_size=40))
def test_formula_elements_matches_python_mirror(spark, batch):
    from multiomics_biocypher_kg_spark.functions.chem import formula_elements

    got = _spark_eval(spark, formula_elements, batch)
    want = [py_formula_elements(v) for v in batch]
    assert got == want, [(v, g, w) for v, g, w in zip(batch, got, want) if g != w][:3]


timepoints = st.one_of(
    cells,
    st.builds(
        lambda n, suffix: f"{n}h{suffix}",
        st.floats(min_value=-99, max_value=99).map(lambda x: round(x, 1)),
        st.sampled_from(["", " post-inoculation", " (P added)"]),
    ),
    st.builds(lambda n: f"day {n}", st.integers(min_value=0, max_value=400)),
    st.builds(lambda n: f"Day {n}", st.integers(min_value=0, max_value=400)),
    st.builds(lambda a, b: f"{a}h extended darkness ({b}h)",
              st.integers(0, 48), st.integers(0, 96)),
    st.sampled_from(["R", "R (rescue: x)", "days 60+89", "", "   "]),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(timepoints, min_size=1, max_size=40))
def test_parse_timepoint_matches_python_mirror(spark, batch):
    got = _spark_eval(spark, parse_timepoint_hours, batch)
    want = [py_timepoint(v) for v in batch]
    assert got == want, [(v, g, w) for v, g, w in zip(batch, got, want) if g != w][:3]
