"""Dump executed physical plans of the headline queries to PLANS.md —
the scale-behavior evidence (PushedFilters, pruned ReadSchema, broadcast
joins, codegen spans, Arrow-only Python)."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOW = [
    "tpch_q1", "tpch_q3_top10", "tpch_q6", "domain_links_monthly",
    "frontier_schedule_r0", "dedup_minhash_lsh", "ann_lsh_topk",
    "site_links_rangejoin", "multimodal_decode", "image_dims_real",
    "dedup_winnow", "ann_ivf_topk", "dedup_simhash",
    "ann_ivf_batch", "quality_repetition", "decontam_eval3",
    "pack_sequences", "pack_manifest", "mix_weighted_sample", "global_shuffle_pos",
    "url_dictionary", "pipeline_e2e", "ann_ivf_kmeans",
]


def main() -> None:
    from warcbase_spark.queries import QUERIES
    from warcbase_spark.session import get_spark

    spark = get_spark(app_name="plans", master="local[8]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.01"
    out = ["# PLANS — executed physical plans (sf0.01, AQE final plans)", ""]
    for name in SHOW:
        df = QUERIES[name](spark, sf)
        df.write.mode("overwrite").format("noop").save()  # finalize AQE
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        out += [f"## {name}", "```", plan.strip()[:6000], "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print("PLANS.md written")


if __name__ == "__main__":
    main()
