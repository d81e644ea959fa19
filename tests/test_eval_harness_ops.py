"""Contract tests for the classifier-eval harness batch: histogram
ROC-AUC, confusion / macro-F1, and Fleiss' kappa — each checked
against an independent pure-Python mirror (direct pairwise AUC,
direct cell counting, per-item P_i kappa), not just the DuckDB
oracle's histogram/collapsed forms."""

from __future__ import annotations

import hashlib
from collections import Counter

from tests.conftest import SF_TINY


def _md5_long(s: str) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def _score(text: str) -> tuple[int, int]:
    toks = text.split(" ")
    return sum(_md5_long(t) % 2001 - 1000 for t in toks), len(toks)


def _noise(salt: str, doc_id: int, width: int) -> int:
    return _md5_long(f"{salt}#{doc_id}") % (2 * width + 1) - width


def _band(x: int, n: int) -> str:
    if x >= 50 * n:
        return "high"
    if x < -50 * n:
        return "low"
    return "mid"


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )


def test_quality_auc_matches_pairwise_mirror(spark):
    """The histogram Mann-Whitney AUC must equal the DIRECT pairwise
    AUC computed over binned scores (pos>neg pairs + half the ties),
    recomputed in pure Python from md5 first principles."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    import math

    pts = []
    for r in _docs(spark):
        s, n = _score(r["text"])
        b = max(-1000, min(1000, math.floor(s / n)))
        gold = 1 if s + _noise("auc", r["doc_id"], 100) * n > 0 else 0
        pts.append((b, gold))
    pos = [b for b, g in pts if g == 1]
    neg = [b for b, g in pts if g == 0]
    num2 = sum(
        2 if p > q else 1 if p == q else 0 for p in pos for q in neg
    )
    exp_auc = round(num2 / (2.0 * len(pos) * len(neg)), 6)
    row = QUERIES["text_quality_auc"](spark, SF_TINY).collect()[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert row["auc"] == exp_auc
    assert abs(row["gini"] - (2 * exp_auc - 1)) < 2e-6
    assert 0.5 < row["auc"] < 1.0  # informative, not degenerate


def test_quality_confusion_matches_cell_mirror(spark):
    """Every per-class row (counts AND rounded PRF) plus the macro
    row must pin against direct cell counting."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    cells = Counter()
    for r in _docs(spark):
        s, n = _score(r["text"])
        gold = _band(s + _noise("gold", r["doc_id"], 100) * n, n)
        cells[(gold, _band(s, n))] += 1
    exp = {}
    prf = {}
    for c in ("low", "mid", "high"):
        n_gold = sum(v for (g, _), v in cells.items() if g == c)
        n_pred = sum(v for (_, p), v in cells.items() if p == c)
        tp = cells.get((c, c), 0)
        prec = tp / n_pred if n_pred else 0.0
        rec = tp / n_gold if n_gold else 0.0
        f1 = 2.0 * tp / (n_pred + n_gold) if n_pred + n_gold else 0.0
        exp[c] = (n_gold, n_pred, tp, round(prec, 6), round(rec, 6), round(f1, 6))
        prf[c] = (prec, rec, f1)
    exp["macro"] = (
        sum(exp[c][0] for c in prf),
        sum(exp[c][1] for c in prf),
        sum(exp[c][2] for c in prf),
        round(sum(p[0] for p in prf.values()) / 3.0, 6),
        round(sum(p[1] for p in prf.values()) / 3.0, 6),
        round(sum(p[2] for p in prf.values()) / 3.0, 6),
    )
    got = {
        r["class"]: (
            r["n_gold"], r["n_pred"], r["tp"],
            r["precision"], r["recall"], r["f1"],
        )
        for r in QUERIES["text_quality_confusion"](spark, SF_TINY).collect()
    }
    assert got == exp
    assert len({v[:3] for v in got.values()}) > 1  # non-degenerate


def test_fleiss_kappa_matches_per_item_mirror(spark):
    """Kappa recomputed the TEXTBOOK way — per-item P_i from each
    item's category counts, category marginals from totals — must
    pin the collapsed per-category implementation."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    items = []
    for r in _docs(spark):
        s, n = _score(r["text"])
        items.append(
            Counter(
                _band(s + _noise(f"rater{k}", r["doc_id"], 50) * n, n)
                for k in range(3)
            )
        )
    N, R = len(items), 3
    p_bar = sum(
        (sum(v * v for v in it.values()) - R) / (R * (R - 1)) for it in items
    ) / N
    marg = Counter()
    for it in items:
        marg.update(it)
    p_e = sum((c / (R * N)) ** 2 for c in marg.values())
    exp_kappa = round((p_bar - p_e) / (1 - p_e), 6)
    row = QUERIES["data_fleiss_kappa"](spark, SF_TINY).collect()[0]
    assert row["n_items"] == N and row["n_raters"] == R
    assert row["n_categories"] == len(marg)
    assert abs(row["p_bar"] - p_bar) < 2e-6
    assert abs(row["p_e"] - p_e) < 2e-6
    assert row["kappa"] == exp_kappa
    assert 0.0 < row["kappa"] < 1.0  # substantial but imperfect


def test_ndcg_matches_naive_full_sort_mirror(spark):
    """The top-k + histogram NDCG plan must equal the NAIVE
    definition — full corpus sort by score, DCG over the first 10,
    IDCG over the globally sorted gold relevances — recomputed in
    pure Python from md5 first principles."""
    import math

    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = _docs(spark)
    scored = []
    for r in rows:
        S, n = _score(r["text"])
        gold = S + _noise("gold", r["doc_id"], 100) * n
        rel = 2 if gold >= 50 * n else (0 if gold < -50 * n else 1)
        scored.append((S / n, r["doc_id"], rel))
    by_score = sorted(scored, key=lambda t: (-t[0], t[1]))
    gains = {2: 3.0, 1: 1.0, 0: 0.0}
    dcg = sum(
        gains[rel] / math.log2(i + 2)
        for i, (_, _, rel) in enumerate(by_score[:10])
    )
    ideal_rels = sorted((rel for _, _, rel in scored), reverse=True)[:10]
    idcg = sum(
        gains[rel] / math.log2(i + 2) for i, rel in enumerate(ideal_rels)
    )
    got = QUERIES["text_ndcg_eval"](spark, SF_TINY).collect()[0]
    assert got["k"] == 10
    assert got["n_docs"] == len(scored)
    assert abs(got["dcg"] - dcg) < 1e-6
    assert abs(got["idcg"] - idcg) < 1e-6
    assert abs(got["ndcg"] - dcg / idcg) < 1e-6
    assert 0.0 < got["ndcg"] <= 1.0


def test_ece_matches_per_doc_mirror(spark):
    """The histogram ECE/MCE/Brier must equal a direct per-document
    mirror that bins every doc, assigns the logistic of its bin as
    confidence, and averages — recomputed in pure Python."""
    import math
    from collections import defaultdict

    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = _docs(spark)
    bins = defaultdict(lambda: [0, 0])  # bin -> [n, pos]
    for r in rows:
        S, n = _score(r["text"])
        b = max(-1000, min(1000, math.floor(S / n)))
        gold = 1 if S + _noise("auc", r["doc_id"], 100) * n > 0 else 0
        bins[b][0] += 1
        bins[b][1] += gold
    N = sum(v[0] for v in bins.values())
    ece = mce = brier = 0.0
    for b, (nb, pos) in bins.items():
        conf = 1.0 / (1.0 + math.exp(-b / 1000.0))
        acc = pos / nb
        gap = abs(acc - conf)
        ece += nb * gap
        mce = max(mce, gap)
        brier += pos * (1 - conf) ** 2 + (nb - pos) * conf**2
    got = QUERIES["text_quality_ece"](spark, SF_TINY).collect()[0]
    assert got["n_bins"] == len(bins)
    assert got["n_docs"] == N
    assert abs(got["ece"] - ece / N) < 1e-6
    assert abs(got["mce"] - mce) < 1e-6
    assert abs(got["brier"] - brier / N) < 1e-6


def test_conformal_gate_matches_per_doc_mirror(spark):
    """The histogram-order-statistic conformal gate must equal the
    textbook per-document construction: nonconformity list on the
    calibration split, qhat = the ceil((n+1)*0.9)-th smallest,
    coverage counted doc by doc on the test split — recomputed in
    pure Python. Also pins the conformal promise itself: empirical
    coverage within sampling slack of the >= 0.9 guarantee."""
    import math

    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = _docs(spark)
    cal_nc, test = [], []
    for r in rows:
        S, n = _score(r["text"])
        b = max(-1000, min(1000, math.floor(S / n)))
        gold = 1 if S + _noise("auc", r["doc_id"], 100) * n > 0 else 0
        p1 = 1.0 / (1.0 + math.exp(-b / 1000.0))
        if r["doc_id"] % 5 == 0:
            cal_nc.append(1.0 - p1 if gold == 1 else p1)
        else:
            test.append((gold, p1))
    cal_nc.sort()
    k = math.ceil((len(cal_nc) + 1) * 0.9)
    qhat = cal_nc[k - 1] if k <= len(cal_nc) else 1.0
    covered = sizes = 0
    for gold, p1 in test:
        in1 = (1.0 - p1) <= qhat
        in0 = p1 <= qhat
        covered += (gold == 1 and in1) or (gold == 0 and in0)
        sizes += int(in1) + int(in0)
    got = QUERIES["data_conformal_gate"](spark, SF_TINY).collect()[0]
    assert got["n_cal"] == len(cal_nc)
    assert got["n_test"] == len(test)
    assert abs(got["qhat"] - qhat) < 1e-6
    assert abs(got["coverage"] - covered / len(test)) < 1e-6
    assert abs(got["avg_set_size"] - sizes / len(test)) < 1e-6
    # the distribution-free guarantee, with finite-sample slack
    assert got["coverage"] >= 0.9 - 3.0 / (len(cal_nc) ** 0.5)


def test_bootstrap_ci_matches_per_doc_mirror(spark):
    """The one-pass Poisson bootstrap must equal the literal
    construction: 20 hash-weighted replicates computed doc by doc in
    pure Python, CI = the 1st and 19th order statistics."""
    import math

    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = _docs(spark)
    correct = {}
    for r in rows:
        S, n = _score(r["text"])
        pred = 1 if S > 0 else 0
        gold = 1 if S + _noise("auc", r["doc_id"], 100) * n > 0 else 0
        correct[r["doc_id"]] = int(pred == gold)

    def weight(doc_id: int, b: int) -> int:
        m = _md5_long(f"{doc_id}#boot{b}") % 1000
        return 0 if m < 368 else 1 if m < 736 else 2 if m < 920 else 3 if m < 981 else 4

    accs = []
    for b in range(20):
        num = den = 0
        for d, c in correct.items():
            w = weight(d, b)
            num += w * c
            den += w
        accs.append(num / den)
    accs_sorted = sorted(accs)
    nb = len(accs)
    s1, s2 = sum(accs), sum(a * a for a in accs)
    se = math.sqrt((s2 - s1 * s1 / nb) / (nb - 1))
    got = QUERIES["data_bootstrap_ci"](spark, SF_TINY).collect()[0]
    assert got["n_docs"] == len(correct)
    assert got["n_boot"] == 20
    assert abs(got["acc"] - sum(correct.values()) / len(correct)) < 1e-6
    assert abs(got["ci_lo"] - accs_sorted[0]) < 1e-6
    assert abs(got["ci_hi"] - accs_sorted[18]) < 1e-6
    assert abs(got["boot_se"] - se) < 1e-6
    assert got["ci_lo"] <= got["acc"] <= got["ci_hi"]
