"""Per-stage Ray Data stats audit: run the flagship extraction and the
composed quality pipeline over a small corpus and print `ds.stats()` so
the wall-time split per operator is inspectable (the "is time going to
useful compute, not conversion/shuffle overhead?" check).

Usage: python tools/stats_audit.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import shutil
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    import pandas as pd
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from pdf_extract_ray.corpus import pages_from_documents
    from pdf_extract_ray.pipelines.extract import extract_pages_fused

    pages_tbl = pages_from_documents(
        pq.read_table(f"{sf_dir}/documents.parquet"))
    pages = rd.from_arrow(pages_tbl).repartition(8)
    out = "/tmp/stats_audit_out"
    shutil.rmtree(out, ignore_errors=True)
    extracted = extract_pages_fused(pages)
    extracted.write_parquet(out)
    print("=" * 72)
    print("FLAGSHIP EXTRACTION ds.stats()")
    print("=" * 72)
    print(extracted.stats())
    shutil.rmtree(out, ignore_errors=True)

    from pdf_extract_ray.pipelines.quality import quality_pairs

    def mk_pairs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "kr_text": b["text"].fillna(""),
            "en_text": b["text"].fillna(""),
        })

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    qp = quality_pairs(docs.map_batches(mk_pairs, batch_format="pandas"))
    res = qp.materialize()
    print("=" * 72)
    print("QUALITY PIPELINE ds.stats()")
    print("=" * 72)
    print(res.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
