"""Regenerate the committed golden parquet files that back the
golden-file oracle entries (``__ray_entry__.oracle_sql``).

Run after any deliberate change to the extraction pipeline or the
transcript synthesis contract:

    python scripts/regen_goldens.py

The goldens are the sf0.01 outputs of the flagship queries, stable-
sorted. They are NOT self-blessing: extraction correctness is pinned
independently by tests/test_reference_corpus.py (real reference PDFs)
and tests/test_pipeline.py (per-turn equality vs an in-repo
re-derivation); the goldens freeze that verified behavior so the
driver can value-hash the flagship instead of only counting rows.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.01"
OUT = os.path.join(REPO, "tests", "golden")


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as e

    os.makedirs(OUT, exist_ok=True)
    q = e.queries()

    turns = q["x_extract_turns"](SF)
    t = pa.concat_tables(turns.iter_batches(batch_format="pyarrow"))
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    pq.write_table(t, os.path.join(OUT, "x_extract_turns_sf001.parquet"))
    print("x_extract_turns golden:", t.num_rows, "rows")

    metrics = q["x_extract_metrics"](SF)
    m = pa.concat_tables(metrics.iter_batches(batch_format="pyarrow"))
    m = m.sort_by([("kind", "ascending"), ("status", "ascending")])
    pq.write_table(m, os.path.join(OUT, "x_extract_metrics_sf001.parquet"))
    print("x_extract_metrics golden:", m.num_rows, "rows")

    spans = q["x_extract_spans"](SF)
    sp = pa.concat_tables(spans.iter_batches(batch_format="pyarrow"))
    sp = sp.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending"),
                     ("span_idx", "ascending")])
    pq.write_table(sp, os.path.join(OUT, "x_extract_spans_sf001.parquet"))
    print("x_extract_spans golden:", sp.num_rows, "rows")

    # deterministic under the fixed 16-way hash partitioning
    w = pa.Table.from_pandas(q["x_extract_write"](SF), preserve_index=False)
    w = w.sort_by([("part_id", "ascending")])
    pq.write_table(w, os.path.join(OUT, "x_extract_write_sf001.parquet"))
    print("x_extract_write golden:", w.num_rows, "rows")

    # NOTE: s_knn_lsh / s_knn_ivf / m_media_decode / m_frame_sample no
    # longer use goldens — their oracles are independent recomputations
    # (seed-derived SQL literals; spec-rederived media parquet).

    ray.shutdown()


if __name__ == "__main__":
    main()
