"""Training-data curation job (spark-submit entrypoint): documents ->
quality gate -> exact dedup -> near-dup cluster collapse -> stratified
sample -> curated parquet, with per-stage metrics.

The end-to-end composition of the pipeline operators (the order
matters and IS the product):
1. quality gate   — cheap codegen filter first, cuts everything after
2. exact dedup    — md5 groups, keep min doc id (one hash shuffle)
3. near-dup LSH   — MinHash candidates (hot-bucket-capped production
                    entry) -> connected components -> keep each
                    cluster's canonical representative
4. stratified sample — deterministic top-N per (lang, source): the
                    reproducible training-mix step
Every stage appends a metrics row (kept/dropped counts), so a curation
run is auditable after the fact.

Cluster usage:
  spark-submit --py-files geotrellis_spark.zip jobs/curate.py \
      --docs-path <parquet> --out s3://bucket/curated --per-stratum 1000
Sandbox usage:
  python jobs/curate.py --docs-path /root/testdata/sf0.01/documents.parquet \
      --out /tmp/curated --per-stratum 20
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from geotrellis_spark.operators.curation import curate  # noqa: E402, F401
from geotrellis_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-path", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--per-stratum", type=int, default=100)
    ap.add_argument("--salt", type=int, default=42)
    ap.add_argument("--job-id", default=None)
    ap.add_argument("--bench-path", default=None,
                    help="benchmark/eval docs parquet: adds the "
                         "decontamination stage (drop train/eval leakage)")
    ap.add_argument("--min-shared", type=int, default=25)
    args = ap.parse_args()
    job_id = args.job_id or f"curate-{os.path.basename(args.out)}"

    spark = get_spark("curate")
    t0 = time.time()
    docs = spark.read.parquet(args.docs_path)
    bench = (spark.read.parquet(args.bench_path)
             if args.bench_path else None)
    curated, stats = curate(
        spark, docs, args.per_stratum, args.salt,
        metrics=(os.path.join(args.out, "_jobs"), job_id),
        bench=bench, min_shared=args.min_shared,
    )
    curated.write.mode("overwrite").parquet(os.path.join(args.out, "docs"))
    stats["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
