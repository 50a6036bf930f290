"""Generate EXPLAINS.md: formatted physical plans for every headline
query at sf0.1 — the artifact for reviewing plan quality (pushdown,
pruning, broadcast choice, shuffle placement) without a cluster.

    python scripts/explain_headlines.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_dataflow_batch_processing_spark.plans import count_shuffles, executed_plan
from cloud_dataflow_batch_processing_spark.queries import REGISTRY, headline_queries, queries
from cloud_dataflow_batch_processing_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cdbp-explains")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# Headline query physical plans (generated; do not edit)",
        "",
        f"Scale: `{sf_dir}`. Review targets: PushedFilters reach the scan,",
        "ReadSchema is pruned, dims broadcast, shuffle count is the",
        "semantic minimum. Regenerate: `python scripts/explain_headlines.py`.",
        "",
    ]
    queries()
    # Non-headline operators whose plan shape is itself the deliverable.
    extra = [
        "asof_join_events",
        "range_join_events",
        "heavy_hitters_countmin",
        "table_fingerprint",
        "snapshot_diff_orders",
    ]
    audited = dict(headline_queries())
    audited.update({n: REGISTRY[n].fn for n in extra})
    for name, fn in audited.items():
        df = fn(spark, sf_dir)
        out.append(f"## {name}")
        out.append(f"shuffle exchanges: **{count_shuffles(df)}**")
        out.append("```")
        out.append(executed_plan(df).strip())
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAINS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote EXPLAINS.md")


if __name__ == "__main__":
    main()
