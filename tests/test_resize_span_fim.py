"""Contract tests for the real PPM resize (numpy-free pixel replay +
the valid-payload contract), span-corruption planning (sequential
Python mask replay + coverage contract), and the FIM transform
(string replay + non-empty-segment contract)."""

from __future__ import annotations

import hashlib

import duckdb

from tests.conftest import SF_TINY


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs():
    con = duckdb.connect()
    return con.sql(
        f"SELECT doc_id, text FROM '{SF_TINY}/documents.parquet'"
    ).fetchall()


def test_resize_real_matches_pixel_replay_and_emits_valid_ppm(spark):
    from multiomics_biocypher_kg_spark.operators.multimodal import (
        _parse_ppm,
        attach_real_payloads,
        resize_real_images,
    )
    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = QUERIES["mm_resize_real"](spark, SF_TINY).collect()
    texts = dict(_docs())
    assert len(rows) == sum(1 for d in texts if d % 2 == 0)
    for r in rows[:50]:
        data = texts[r["doc_id"]].encode("utf-8")
        kept = []
        for rr in range(4):
            for cc in range(4):
                base = ((2 * rr) * 8 + (2 * cc)) * 3
                for ch in range(3):
                    kept.append(data[(base + ch) % len(data)])
        assert r["n_units"] == 48
        assert r["out_width"] == 4 and r["out_height"] == 4
        assert abs(r["mean_value"] - round(sum(kept) / 48, 6)) < 1e-9
        assert abs(r["mean_r"] - round(sum(kept[0::3]) / 16, 6)) < 1e-9
        assert abs(r["mean_b"] - round(sum(kept[2::3]) / 16, 6)) < 1e-9
    # the re-emitted payload is a VALID 4x4 P6 any parser accepts
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").limit(20)
    media = attach_real_payloads(docs).where("kind = 'image'")
    payloads = resize_real_images(media, factor=2).select("payload").collect()
    assert payloads
    for p in payloads:
        w, h, px = _parse_ppm(bytes(p["payload"]))
        assert (w, h, len(px)) == (4, 4, 48)


def test_span_corruption_matches_sequential_replay(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    expected = {}
    total_tokens = 0
    total_masked = 0
    for doc_id, text in _docs():
        toks = text.split(" ")
        n = len(toks)
        total_tokens += n
        masked = [False] * n
        for p in range(n):
            if _md5_long(f"{doc_id}:{p}#spanstart") % 20 == 0:
                ln = 2 + _md5_long(f"{doc_id}:{p}#spanlen") % 3
                for q in range(p, min(n, p + ln)):
                    masked[q] = True
        spans = []
        p = 0
        while p < n:
            if masked[p]:
                q = p
                while q + 1 < n and masked[q + 1]:
                    q += 1
                spans.append((p, q, q - p + 1))
                p = q + 1
            else:
                p += 1
        total_masked += sum(c for _, _, c in spans)
        for sid, (a, b, c) in enumerate(spans, 1):
            expected[(doc_id, sid)] = (a, b, c)

    rows = QUERIES["text_span_corruption"](spark, SF_TINY).collect()
    assert len(rows) == len(expected)
    for r in rows:
        a, b, c = expected[(r["doc_id"], r["sentinel_id"])]
        assert (r["span_start"], r["span_end"], r["n_masked"]) == (a, b, c)
    # coverage lands near the designed ~15% mask rate
    assert 0.08 <= total_masked / total_tokens <= 0.25


def test_fim_transform_matches_string_replay(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = {r["doc_id"]: r for r in
            QUERIES["text_fim_transform"](spark, SF_TINY).collect()}
    n_checked = 0
    for doc_id, text in _docs():
        toks = text.split(" ")
        n = len(toks)
        if n < 3:
            assert doc_id not in rows
            continue
        c1 = 1 + _md5_long(f"{doc_id}#fim1") % (n - 2)
        c2 = c1 + 1 + _md5_long(f"{doc_id}#fim2") % (n - c1 - 1)
        psm = (
            "<PRE> " + " ".join(toks[:c1])
            + " <SUF> " + " ".join(toks[c2:])
            + " <MID> " + " ".join(toks[c1:c2])
        )
        r = rows[doc_id]
        assert r["cut1"] == c1 and r["cut2"] == c2
        assert r["middle_len"] == c2 - c1
        assert r["fim_md5"] == hashlib.md5(psm.encode()).hexdigest()
        # all three segments non-empty by construction
        assert 1 <= c1 < c2 < n
        n_checked += 1
    assert n_checked == len(rows)
