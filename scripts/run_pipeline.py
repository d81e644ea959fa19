#!/usr/bin/env python
"""spark-submit entrypoint for the staged KG-construction pipeline.

Cluster (the north-rule deployment):

    ./scripts/package.sh           # -> dist/multiomics_biocypher_kg_spark.zip
    spark-submit \\
        --master yarn --deploy-mode cluster \\
        --num-executors 1000 --executor-cores 5 --executor-memory 24g \\
        --conf spark.sql.shuffle.partitions=12000 \\
        --py-files dist/multiomics_biocypher_kg_spark.zip \\
        scripts/run_pipeline.py \\
        --sf-dir s3://corpus/pages --workdir s3://warehouse/kg \\
        --checkpoint-dir hdfs:///checkpoints/kg

Local smoke (same artifact, small corpus):

    spark-submit --master 'local[8]' \\
        --py-files dist/multiomics_biocypher_kg_spark.zip \\
        scripts/run_pipeline.py \\
        --sf-dir /root/testdata/sf0.001 --workdir /tmp/kg_run

Every stage materializes as an idempotent parquet stage table with a
lineage row (counts + checksums); re-submitting the SAME command
resumes: completed stages verify their recorded checksum and are
skipped, a crashed half-write converges through the MERGE INTO
emulation. Exit output is one JSON line with per-stage row counts.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True, help="input corpus directory (parquet tables)")
    ap.add_argument("--workdir", required=True, help="stage-table warehouse directory")
    ap.add_argument(
        "--shuffle-partitions",
        type=int,
        default=None,
        help="override spark.sql.shuffle.partitions (cluster: 2-3x total cores)",
    )
    ap.add_argument(
        "--checkpoint-dir",
        default=None,
        help="durable checkpoint dir (enables reliable CC checkpointing)",
    )
    ap.add_argument(
        "--local-master",
        default=None,
        help="run with an in-process master (e.g. local[8]) instead of spark-submit's",
    )
    args = ap.parse_args(argv)

    from multiomics_biocypher_kg_spark.plans.pipeline import run_staged
    from multiomics_biocypher_kg_spark.session import build_session

    spark = build_session(
        master=args.local_master or "submit",
        shuffle_partitions=args.shuffle_partitions,
    )
    cc_checkpoint = "local"
    if args.checkpoint_dir:
        spark.sparkContext.setCheckpointDir(args.checkpoint_dir)
        cc_checkpoint = "reliable"
    stages = run_staged(
        spark, args.sf_dir, args.workdir, cc_checkpoint=cc_checkpoint
    )
    summary = {name: df.count() for name, df in stages.items()}
    print(json.dumps({"status": "ok", "rows": summary}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
