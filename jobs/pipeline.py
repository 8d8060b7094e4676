"""Declarative pipeline job (spark-submit entrypoint): run a JSON
pipeline AST (see geotrellis_spark/plans/pipeline.py — the reference's
spark-pipeline role).

Usage:
  python jobs/pipeline.py --ast '[{"type":"read.synth","n":200}, ...]'
  python jobs/pipeline.py --ast-file ingest.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geotrellis_spark.plans.pipeline import run_pipeline  # noqa: E402
from geotrellis_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--ast", help="inline JSON AST")
    g.add_argument("--ast-file", help="path to a JSON AST file")
    args = ap.parse_args()
    ast = (
        json.loads(args.ast)
        if args.ast
        else json.load(open(args.ast_file))
    )
    spark = get_spark("pipeline")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out = run_pipeline(spark, ast)
    print(
        json.dumps(
            {
                "kind": out["kind"],
                "zoom": out["zoom"],
                "writes": out["writes"],
                "rows": out["result"].count()
                if out["result"] is not None
                else 0,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
