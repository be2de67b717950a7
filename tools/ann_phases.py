#!/usr/bin/env python
"""Split the ANN headline entries into INDEX BUILD vs SEARCH phases
(VERDICT r6 item 4, the `components_phases.py` discipline): the
registered `pq_adc_topk` / `ivf_adc_topk` queries train Lloyd's
codebooks and encode the corpus INSIDE the timed query, which prices a
one-time index build as if it were per-query cost.  Steady-state ANN
cost is the search phase alone — distance-table broadcast + code-table
join + rank over a prebuilt index.

Phases per query:
  build : pq_codebooks (m Lloyd's runs) + pq_encode, materialized with
          an eager localCheckpoint (the persisted index a real system
          stores once)
  search: the ADC tail against the prebuilt index, identical to the
          registered query's plan from the index onward (same orderBy)

Usage: python tools/ann_phases.py [sf_dir]   (default sf0.1)
Prints one JSON line with both queries' phase times (best of 2);
paste into PLANS.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from video_metadata_db_spark.operators.quantization import (
        ivf_adc_topk,
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )
    from video_metadata_db_spark.plans.quant_queries import _QUERY_IDS, _TOPK
    from video_metadata_db_spark.session import get_spark
    from video_metadata_db_spark.sources.tables import load_table

    spark = get_spark("ann-phases")
    results: dict[str, dict] = {}

    for name, search_fn in (
        ("pq_adc_topk", pq_adc_topk),
        ("ivf_adc_topk", ivf_adc_topk),
    ):
        best_total = float("inf")
        for rep in range(2):
            emb = load_table(spark, SF_DIR, "embeddings")

            t0 = time.perf_counter()
            books = pq_codebooks(emb)
            codes = pq_encode(emb, books).localCheckpoint(eager=True)
            t1 = time.perf_counter()

            out = search_fn(
                emb, _QUERY_IDS, topk=_TOPK, books=books, codes=codes
            ).orderBy("query_id", "cand_id")
            out.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()

            total = t2 - t0
            if total < best_total:
                best_total = total
                results[name] = {
                    "index_build_sec": round(t1 - t0, 3),
                    "search_sec": round(t2 - t1, 3),
                    "total_sec": round(total, 3),
                    "rep": rep,
                }
    print(json.dumps({"sf_dir": SF_DIR, **results}))
    from phases_io import record_phases

    record_phases({"sf_dir": SF_DIR, **results})
    spark.stop()


if __name__ == "__main__":
    main()
