"""Contract tests for the round-4z batch: ontology semantic
similarity (Resnik/Lin), LPA-partition modularity, and the
embedding drift monitor — each checked against an independent pure
Python mirror, not just the DuckDB oracle."""

from __future__ import annotations

import math

from tests.conftest import SF_TINY


def test_resnik_lin_match_python_tree_mirror(spark):
    """Recompute the quad-tree closure, descendant counts, and
    min-descendant LCA in pure Python and pin both similarity values
    for every probe pair."""
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_ontology import _SIM_PAIR_MOD

    max_id = (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .agg({"doc_id": "max"})
        .collect()[0][0]
    )
    ids = range(max_id + 1)
    nodes = {i for i in ids} | {i // 4 for i in ids if i > 0}
    n = len(nodes)

    def ancs(x):  # ancestors including self
        out = [x]
        while x > 0:
            x //= 4
            out.append(x)
        return out

    desc = {c: 0 for c in nodes}
    for v in nodes:
        for a in ancs(v):
            desc[a] += 1

    def ic(x):
        return math.log2(n) - math.log2(desc[x])

    exp = {}
    for m in ids:
        if m % _SIM_PAIR_MOD == 1 and m > 0 and m + 1 <= max_id:
            common = set(ancs(m)) & set(ancs(m + 1))
            lca = min(common, key=lambda c: (desc[c], f"n{c:04d}"))
            exp[(f"n{m:04d}", f"n{m + 1:04d}")] = (
                f"n{lca:04d}",
                round(ic(lca), 6),
                round(2 * ic(lca) / (ic(m) + ic(m + 1)), 6),
            )

    got = {
        (r["node_a"], r["node_b"]): (r["lca"], r["resnik"], r["lin"])
        for r in QUERIES["onto_resnik_similarity"](spark, SF_TINY).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], (k, got[k], exp[k])
        assert abs(got[k][1] - exp[k][1]) < 2e-6
        assert abs(got[k][2] - exp[k][2]) < 2e-6
        assert 0 <= got[k][2] <= 1.0


def test_modularity_matches_python_partition_mirror(spark):
    """Collect the (small) host graph and the LPA labels, compute
    Newman Q per community in pure Python, and pin every row; the
    partition must also score clearly above random (Q > 0)."""
    from collections import Counter

    from multiomics_biocypher_kg_spark.registry import QUERIES

    labels = {
        r["host"]: r["community"]
        for r in QUERIES["web_communities"](spark, SF_TINY).collect()
    }
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        host_graph,
        href_edges,
    )
    from multiomics_biocypher_kg_spark.sources.pages import (
        pages_from_documents,
    )

    g = host_graph(href_edges(pages_from_documents(spark, SF_TINY)))
    e = {
        (r["src_host"], r["dst_host"])
        for r in g.collect()
        if r["src_host"] != r["dst_host"]
    }
    und = e | {(b, a) for a, b in e}
    m2 = len(und)
    deg = Counter(a for a, _ in und)
    in_pairs = Counter()
    deg_sum = Counter()
    n_hosts = Counter()
    for a, b in und:
        if labels[a] == labels[b]:
            in_pairs[labels[a]] += 1
    for v, c in labels.items():
        deg_sum[c] += deg[v]
        n_hosts[c] += 1
    exp = {
        c: (
            n_hosts[c],
            in_pairs[c] // 2,
            deg_sum[c],
            round(in_pairs[c] / m2 - (deg_sum[c] / m2) ** 2, 6),
        )
        for c in n_hosts
    }
    got = {
        r["community"]: (
            r["n_hosts"],
            r["internal_edges"],
            r["deg_sum"],
            r["q_contrib"],
        )
        for r in QUERIES["web_modularity"](spark, SF_TINY).collect()
    }
    assert got == exp
    q = sum(v[3] for v in got.values())
    assert 0 < q <= 1.0  # real community structure, not rewiring noise


def test_drift_monitor_matches_numpy_mirror(spark):
    """Per-label parity-batch centroids, L2 shift, and cosine pinned
    against a numpy mirror over the raw embeddings."""
    import numpy as np

    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = spark.read.parquet(f"{SF_TINY}/embeddings.parquet").collect()
    by = {}
    for r in rows:
        by.setdefault((r["label"], r["vec_id"] % 2), []).append(
            np.array(r["embedding"], dtype=np.float64)
        )
    labels = {lbl for lbl, _ in by}
    exp = {}
    for lbl in labels:
        c0 = np.mean(by[(lbl, 0)], axis=0)
        c1 = np.mean(by[(lbl, 1)], axis=0)
        l2 = float(np.sqrt(((c0 - c1) ** 2).sum()))
        cos = float(
            (c0 * c1).sum()
            / (np.sqrt((c0**2).sum()) * np.sqrt((c1**2).sum()))
        )
        exp[lbl] = (
            len(by[(lbl, 0)]),
            len(by[(lbl, 1)]),
            round(l2, 6),
            round(cos, 6),
        )
    got = {
        r["label"]: (r["n_old"], r["n_new"], r["l2_drift"], r["cos_sim"])
        for r in QUERIES["emb_drift_monitor"](spark, SF_TINY).collect()
    }
    assert set(got) == set(exp)
    for lbl in exp:
        assert got[lbl][0] == exp[lbl][0] and got[lbl][1] == exp[lbl][1]
        assert abs(got[lbl][2] - exp[lbl][2]) < 2e-6
        assert abs(got[lbl][3] - exp[lbl][3]) < 2e-6
        assert -1.0 <= got[lbl][3] <= 1.0  # a valid cosine (tiny-SF
        # synthetic centroids are near-random, so no alignment floor)


def test_power_iteration_matches_numpy_mirror(spark):
    """Centered power method recomputed in numpy: 3 iterations from
    the all-ones init, same normalization — loadings and the Rayleigh
    eigenvalue estimate must pin, and the loading vector must be
    unit-norm."""
    import numpy as np

    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_mining import _POW_ITERS

    X = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    Xc = X - X.mean(axis=0)
    n, d = Xc.shape
    v = np.ones(d)
    for _ in range(_POW_ITERS):
        w = Xc.T @ (Xc @ v) / n
        z = float(np.sqrt((w**2).sum()))
        v = w / z
    got = {
        r["dim"]: (r["loading"], r["eigval"])
        for r in QUERIES["emb_power_iteration"](spark, SF_TINY).collect()
    }
    assert set(got) == set(range(d))
    for i in range(d):
        assert abs(got[i][0] - round(v[i], 6)) < 2e-6, i
        assert abs(got[i][1] - round(z, 6)) < 2e-6
    norm = sum(l * l for l, _ in got.values())
    assert abs(norm - 1.0) < 1e-4


def test_markov_transitions_match_pandas_mirror(spark):
    """Transition counts and row-normalized probabilities pinned
    against a pandas groupby-lag mirror; each prev row's
    probabilities sum to 1."""
    from collections import Counter, defaultdict

    from multiomics_biocypher_kg_spark.registry import QUERIES

    ev = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["event_type"])
            for r in spark.read.parquet(f"{SF_TINY}/events.parquet").collect()
        )
    )
    by_user = defaultdict(list)
    for u, ts, eid, et in ev:
        by_user[u].append(et)
    cnt = Counter()
    for types in by_user.values():
        for a, b in zip(types, types[1:]):
            cnt[(a, b)] += 1
    tot = Counter()
    for (a, _), n in cnt.items():
        tot[a] += n
    exp = {
        (a, b): (n, round(n / tot[a], 6)) for (a, b), n in cnt.items()
    }
    got = {
        (r["prev_type"], r["next_type"]): (r["n_transitions"], r["p"])
        for r in QUERIES["ev_markov_transitions"](spark, SF_TINY).collect()
    }
    assert got == exp
    sums = defaultdict(float)
    for (a, _), (_, p) in got.items():
        sums[a] += p
    assert all(abs(s - 1.0) < 1e-4 for s in sums.values())


def test_temporal_conflicts_banded_join_equals_naive(spark):
    """The banded equi-join must return EXACTLY the naive O(n^2)
    interval self-join's conflicts — same pairs, same overlap spans —
    and every returned pair must genuinely overlap with differing
    objects."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    max_id = (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .agg({"doc_id": "max"})
        .collect()[0][0]
    )
    claims = []
    for i in range(max_id + 1):
        vfrom = (i * 17) % 400
        claims.append(
            (i, f"e{i % 40}", f"s{i % 5}", f"v{i % 3}", vfrom,
             vfrom + 20 + (i % 7) * 10)
        )
    exp = {}
    for ai in range(len(claims)):
        for bi in range(ai + 1, len(claims)):
            a, b = claims[ai], claims[bi]
            if (
                a[1] == b[1]
                and a[4] <= b[5]
                and b[4] <= a[5]
                and a[3] != b[3]
            ):
                exp[(a[0], b[0])] = (
                    a[1], a[2], b[2], a[3], b[3],
                    max(a[4], b[4]), min(a[5], b[5]),
                )
    got = {
        (r["claim_a"], r["claim_b"]): (
            r["subj"], r["src_a"], r["src_b"], r["obj_a"], r["obj_b"],
            r["overlap_from"], r["overlap_to"],
        )
        for r in QUERIES["kg_temporal_conflicts"](spark, SF_TINY).collect()
    }
    assert got == exp
    for (_, _), (_, _, _, oa, ob, f, t) in got.items():
        assert oa != ob and f <= t


def test_hearst_patterns_match_python_re_mirror(spark):
    """Synthesize the same pages in Python, run the same two regexes
    with re, and pin every (pattern, hypernym, hyponym) support
    count; every hypernym/hyponym must be a single \\w+ token."""
    import re as _re
    from collections import Counter, defaultdict

    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_mining import (
        _HEARST_A,
        _HEARST_B,
        _HYPO_SPLIT,
    )

    rows = (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    mentions, docs = Counter(), defaultdict(set)
    for r in rows:
        t = r["text"].split(" ")
        page = r["text"]
        if len(t) >= 7:
            if r["doc_id"] % 3 != 2:
                hypos = (
                    f"{t[1]}, {t[2]} and {t[3]}"
                    if r["doc_id"] % 2 == 0
                    else f"{t[1]} and {t[2]}"
                )
                page += f". {t[0]} such as {hypos}."
            if r["doc_id"] % 2 == 0:
                page += f" {t[4]}, {t[5]} and other {t[6]}."
        for pat, hg, lg, lbl in (
            (_HEARST_A, 1, 2, "such_as"),
            (_HEARST_B, 2, 1, "and_other"),
        ):
            for m in _re.finditer(pat, page):
                for hypo in _re.split(_HYPO_SPLIT, m.group(lg)):
                    k = (lbl, m.group(hg), hypo)
                    mentions[k] += 1
                    docs[k].add(r["doc_id"])
    got = {
        (r["pattern"], r["hypernym"], r["hyponym"]): (
            r["n_mentions"],
            r["n_docs"],
        )
        for r in QUERIES["kg_hearst_patterns"](spark, SF_TINY).collect()
    }
    exp = {k: (n, len(docs[k])) for k, n in mentions.items()}
    assert got == exp and len(got) > 0
    for _, hyper, hypo in got:
        assert _re.fullmatch(r"\w+", hyper) and _re.fullmatch(r"\w+", hypo)


def test_bowtie_matches_python_bfs_mirror(spark):
    """Forward/backward BFS from the max-out-degree pivot recomputed
    in pure Python over the same edge list; regions and hop
    distances must pin, and the pivot must be CORE at distance 0."""
    from collections import defaultdict, deque

    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        host_graph,
        href_edges,
    )
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_mining import _BOWTIE_ROUNDS
    from multiomics_biocypher_kg_spark.sources.pages import pages_from_documents

    edges = [
        (r["src_host"], r["dst_host"])
        for r in host_graph(href_edges(pages_from_documents(spark, SF_TINY)))
        .select("src_host", "dst_host")
        .collect()
    ]
    fwd_adj, bwd_adj = defaultdict(list), defaultdict(list)
    outdeg = {}
    for s, d in edges:
        fwd_adj[s].append(d)
        bwd_adj[d].append(s)
        outdeg[s] = outdeg.get(s, 0) + 1
    pivot = min(outdeg, key=lambda h: (-outdeg[h], h))
    nodes = {s for s, _ in edges} | {d for _, d in edges}

    def bfs(adj):
        dist = {pivot: 0}
        q = deque([pivot])
        while q:
            u = q.popleft()
            if dist[u] >= _BOWTIE_ROUNDS:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    fd, bd = bfs(fwd_adj), bfs(bwd_adj)
    exp = {}
    for h in nodes:
        f, b = h in fd, h in bd
        region = "CORE" if f and b else "IN" if b else "OUT" if f else "OTHER"
        exp[h] = (fd.get(h, -1), bd.get(h, -1), region)
    got = {
        r["host"]: (r["fwd_dist"], r["bwd_dist"], r["region"])
        for r in QUERIES["web_bowtie_structure"](spark, SF_TINY).collect()
    }
    assert got == exp
    assert got[pivot] == (0, 0, "CORE")
    assert len({v[2] for v in got.values()}) >= 2  # non-trivial structure


def test_survival_km_matches_python_mirror(spark):
    """Kaplan-Meier recomputed in pure Python (product-limit over
    distinct lifetimes, right-censored at the 7-day horizon window);
    the curve must pin per time point and be non-increasing from
    <= 1."""
    from collections import defaultdict

    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_relational import (
        _KM_CENSOR_DAYS,
    )

    rows = spark.read.parquet(f"{SF_TINY}/events.parquet").select(
        "user_id", "ts"
    ).collect()
    spans = defaultdict(lambda: [None, None])
    for r in rows:
        s = int(r["ts"].timestamp())
        sp = spans[r["user_id"]]
        sp[0] = s if sp[0] is None else min(sp[0], s)
        sp[1] = s if sp[1] is None else max(sp[1], s)
    horizon = max(sp[1] for sp in spans.values())
    users = [
        (
            (sp[1] - sp[0]) // 86400,
            1 if horizon - sp[1] >= _KM_CENSOR_DAYS * 86400 else 0,
        )
        for sp in spans.values()
    ]
    grp = defaultdict(lambda: [0, 0])
    for t, e in users:
        grp[t][0] += e
        grp[t][1] += 1 - e
    exp, s, at_risk = {}, 1.0, len(users)
    for t in sorted(grp):
        d, c = grp[t]
        s *= 1.0 - d / at_risk
        exp[t] = (at_risk, d, c, round(s, 6))
        at_risk -= d + c
    got = {
        r["t_days"]: (
            r["n_at_risk"],
            r["n_events"],
            r["n_censored"],
            r["survival"],
        )
        for r in QUERIES["ev_survival_km"](spark, SF_TINY).collect()
    }
    assert set(got) == set(exp)
    prev = 1.0
    for t in sorted(got):
        assert got[t][:3] == exp[t][:3], t
        assert abs(got[t][3] - exp[t][3]) < 2e-6, t
        assert got[t][3] <= prev + 1e-9
        prev = got[t][3]
