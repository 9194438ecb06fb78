"""Finder: queries whose logical plan references the same parquet table
more than once — candidates for the aggregate-join-back recompute
pattern. Overcounts when physical exchange reuse dedupes; triage hits
by hand. Skips streaming/iterative ops (constructing their df executes
the pipeline)."""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from chyme_spark.registry import load_all
from chyme_spark.session import get_spark

SKIP_PREFIXES = ("x_stream_", "d40_", "d41_", "x_datasource_stream")
SKIP = {
    # iterative / self-executing / session-ledger ops (constructing
    # executes heavy work or reads cached state)
    "x_pagerank", "x_recursive_cte", "x_bpe_train", "x_bpe_apply",
    "x_dedup_clusters", "x_dedup_report", "x_neardup_survivors",
    "x_cluster_label_update", "x_cluster_label_retract",
    "x_incremental_ann", "x_ivf_compaction", "x_ann_overlay_search",
    "x_incremental_neardup", "x_neardup_compaction",
    "x_incremental_index", "x_index_compaction", "x_index_overlay_search",
    "x_incremental_dedup", "x_semdedup", "x_embedding_pq",
    "x_ann_ivf_topk", "x_tokenizer_fertility", "x_mmr_rerank",
}

reg = load_all()
spark = get_spark("scan_finder")
sf = "/root/testdata/sf0.001"
pat = re.compile(r"(documents|lineitem|orders|events|customer|supplier|nation|region|part|partsupp|embeddings|media|queries)\.parquet")
rows = []
for name, q in reg.items():
    if name.startswith(SKIP_PREFIXES) or name in SKIP:
        continue
    t0 = time.time()
    try:
        df = q.fn(spark, sf)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}", flush=True)
        continue
    counts: dict[str, int] = {}
    for m in pat.finditer(plan):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    multi = {t: c for t, c in counts.items() if c >= 2}
    if multi:
        rows.append((name, multi))
    el = time.time() - t0
    if el > 5:
        print(f"# slow construct: {name} {el:.1f}s", flush=True)
print("\n== multi-scan candidates ==")
for name, multi in sorted(rows, key=lambda r: -max(r[1].values())):
    print(f"{name}: {multi}")
