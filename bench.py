"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns_per_sec": ...}

``--scaling`` runs the headline extraction twice in fresh processes
(num_cpus=8 then 32) on the same input and reports both throughputs
plus scaling efficiency (the sandbox proxy for the N vs 4N-node
criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _warm_cache():
    """One untimed read so we measure compute + shuffle, not cold disk."""
    import pyarrow.parquet as pq

    for name in ("documents", "lineitem", "orders", "customer", "events", "embeddings"):
        path = f"{SF_DIR}/{name}.parquet"
        if os.path.exists(path):
            pq.read_table(path)


def bench_extract() -> tuple:
    """Headline: transcript synthesis + extraction + stable sort."""
    from pdf4py_ray.pipelines.extract_pipeline import run_extraction

    pool = max(4, NUM_CPUS - 2)
    t0 = time.perf_counter()
    ds = run_extraction(
        SF_DIR,
        out_dir=None,
        num_partitions=max(32, NUM_CPUS * 2),
        concurrency=(2, pool),
        batch_size=16,
        sort=True,
    )
    n_turns = ds.count()
    dt = time.perf_counter() - t0
    return dt, n_turns


def bench_query(fn) -> float:
    t0 = time.perf_counter()
    res = fn(SF_DIR)
    if hasattr(res, "count"):
        res.count()
    dt = time.perf_counter() - t0
    return dt


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    _init_ray()
    _warm_cache()
    import __ray_entry__ as entrymod

    q = entrymod.queries()
    results: dict = {}

    headline_sec, n_turns = bench_extract()
    results["extract_turns"] = round(headline_sec, 3)

    only = os.environ.get("BENCH_ONLY", "")
    if not only:
        for name in (
            "q_pricing_summary",
            "q_orders_per_nation",
            "q_daily_event_stats",
            "d_exact_dedup",
            "d_minhash_pairs",
            "d_simhash_pairs",
            "t_text_stats",
            "s_knn_brute",
            "d_embedding_dups",
        ):
            results[name] = round(bench_query(q[name]), 3)

    out = {
        "metric": "transcript extraction wall-time at sf (turns incl. synthesis)",
        "value": results["extract_turns"],
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / headline_sec, 1),
    }
    import ray

    ray.shutdown()
    print(json.dumps(out))


def scaling() -> None:
    """Same headline job at 8 and 32 CPUs in fresh processes."""
    here = os.path.abspath(__file__)

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_ONLY="extract")
        out = subprocess.run(
            [sys.executable, here], env=env, capture_output=True, text=True, check=True
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    tp_lo = r_lo["turns_per_sec"]
    tp_hi = r_hi["turns_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (turns/sec at 8 vs 32 cpus)",
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "turns_per_sec_lo": tp_lo,
                "turns_per_sec_hi": tp_hi,
                "scaling_efficiency": round(eff, 3),
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
