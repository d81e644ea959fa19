#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN; this
file holds the extra instrumentation the optimization guide §1 asks
for: per-query isolation, plan capture, noop-sink timing).

Usage:
    python bench_extra.py time q1 q2 ...      # best-of-N count() timing
    python bench_extra.py noop q1 q2 ...      # noop-sink timing (all cols)
    python bench_extra.py plan OUTDIR q1 ...  # dump explain("formatted")
    python bench_extra.py time --all          # all 22 bench queries

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
round-5 measurement scale), SPARK_GRAFT_CPUS, BENCH_EXTRA_PASSES.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_QUERIES = [
    # bench.py HEADLINE
    "kg_triples", "kg_entity_rank", "rel_pricing_summary",
    "rel_market_share", "rel_window_rank_effect", "ev_sessionize",
    "ev_asof_join", "dedup_minhash_lsh", "dedup_exact", "text_stats",
    "ann_bruteforce_topk", "onto_closure",
    # bench.py EXTRA
    "dedup_incremental_lsh", "text_unigram_perplexity",
    "text_pack_sequences", "text_hll_host_cardinality",
    "web_bloom_revisit", "emb_quantize_int8", "text_line_dedup",
    "text_bigram_perplexity", "dedup_winnowing", "web_hyperanf",
]


def _session():
    from multiomics_biocypher_kg_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return build_session(
        app_name="kg-spark-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, int(cpus) * 2),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def main() -> None:
    mode = sys.argv[1]
    if mode == "plan":
        outdir = sys.argv[2]
        names = sys.argv[3:]
    else:
        names = sys.argv[2:]
    if names == ["--all"]:
        names = BENCH_QUERIES

    from multiomics_biocypher_kg_spark import registry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    spark = _session()
    spark.range(1000).selectExpr("sum(id)").collect()

    if mode == "plan":
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = registry.QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(txt)
            print(f"wrote {outdir}/{name}.txt")
        spark.stop()
        return

    passes = int(os.environ.get("BENCH_EXTRA_PASSES", "3"))
    timings: dict[str, list[float]] = {n: [] for n in names}
    for _p in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = registry.QUERIES[name](spark, sf_dir)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            timings[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    spark.stop()
    out = {
        "mode": mode,
        "sf_dir": sf_dir,
        "passes": passes,
        "best": {n: min(v) for n, v in timings.items()},
        "samples": timings,
        "total_best": round(sum(min(v) for v in timings.values()), 3),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
