"""Approximate-nearest-neighbour search over the embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast
once (``ray.put``), every batch does one float64 matmul against it and
emits its *local* top-k per query (the per-batch combiner), and a
single small ``groupby(query_id)`` reduces local top-ks to global
top-k. The corpus is never collected to the driver.

Scale path: sign-LSH (random hyperplanes) bucketing — vectors are
routed to a 16-bit bucket; queries search only their bucket plus
single-bit-flip probes. Recall vs the brute-force baseline is pinned
by tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalized(vecs) -> np.ndarray:
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def query_matrix(ds, num_queries: int, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Deterministic query set: the ``num_queries`` smallest vec_ids."""
    rows = ds.filter(expr=f"{id_col} < {num_queries}").take_all()
    rows.sort(key=lambda r: r[id_col])
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    return ids, _normalized([r[vec_col] for r in rows])


def knn_brute(ds, k: int = 5, num_queries: int = 8,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """Global cosine top-k: per-batch local top-k → tiny global reduce.

    Returns (query_id, neighbor_id, cosine) — ``k`` rows per query,
    self-matches excluded, ties broken by neighbor_id.
    """
    import ray

    q_ids, q_mat = query_matrix(ds, num_queries, id_col, vec_col)
    ref = ray.put((q_ids, q_mat))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qi, qm = ray.get(ref)
        ids = batch[id_col].to_numpy()
        mat = _normalized(batch[vec_col])
        sims = qm @ mat.T  # (num_queries, batch)
        out_q, out_n, out_c = [], [], []
        kk = min(k + 1, sims.shape[1])  # +1 in case the query itself is here
        for row, qid in enumerate(qi):
            # keep EVERY candidate tied with the kk-th best cosine, so an
            # equal-cosine tie at the boundary can't drop the smaller
            # neighbor_id the ROW_NUMBER oracle would pick — the global
            # reduce applies the deterministic (cosine desc, id asc) order
            kth = np.partition(-sims[row], kk - 1)[kk - 1]
            idx = np.nonzero(-sims[row] <= kth)[0]
            for j in idx:
                if ids[j] != qid:
                    out_q.append(int(qid))
                    out_n.append(int(ids[j]))
                    out_c.append(float(sims[row, j]))
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_c})

    def global_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).head(k)

    local = ds.map_batches(local_topk, batch_format="pandas", batch_size=1024)
    return local.groupby("query_id").map_groups(global_topk, batch_format="pandas")


# ---------------------------------------------------------------- sign-LSH

NUM_PLANES = 12  # 4096 buckets


def _planes(dim: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, NUM_PLANES))


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes) > 0
    return (bits * (1 << np.arange(NUM_PLANES))).sum(axis=1).astype(np.int64)


# ---------------------------------------------------------------- IVF

IVF_SAMPLE = 2048


def _kmeans_centroids(sample: np.ndarray, n_clusters: int, iters: int = 8,
                      seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd's k-means on an (already normalized) sample.
    Runs on the driver over a bounded sample — never the full corpus."""
    rng = np.random.RandomState(seed)
    n = len(sample)
    n_clusters = min(n_clusters, n)
    cents = sample[rng.choice(n, size=n_clusters, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(n_clusters):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cents[c] = v / norm
    return cents


def knn_ivf(ds, k: int = 5, num_queries: int = 8, n_clusters: int = 16,
            nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF ANN: coarse k-means centroids from a driver-side sample
    (broadcast once), each corpus vector routed to its nearest
    centroid, each query scanning only its ``nprobe`` nearest cells.
    Same local-top-k → tiny global reduce shape as :func:`knn_brute`;
    at scale the centroid assignment keys a hash partition so a cell's
    candidates are co-located."""
    import ray

    q_ids, q_mat = query_matrix(ds, num_queries, id_col, vec_col)
    sample_rows = ds.limit(IVF_SAMPLE).take_all()
    sample = _normalized([r[vec_col] for r in sample_rows])
    cents = _kmeans_centroids(sample, n_clusters)
    # per query: the nprobe closest cells
    q_cells = np.argsort(-(q_mat @ cents.T), axis=1)[:, :nprobe]
    cell_to_queries: dict = {}
    for qi, cells in zip(q_ids, q_cells):
        for c in cells:
            cell_to_queries.setdefault(int(c), []).append(int(qi))
    ref = ray.put((q_ids, q_mat, cents, cell_to_queries))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qi, qm, centroids, probe_cells = ray.get(ref)
        ids = batch[id_col].to_numpy()
        mat = _normalized(batch[vec_col])
        cells = np.argmax(mat @ centroids.T, axis=1)
        q_index = {int(q): i for i, q in enumerate(qi)}
        out_q, out_n, out_c = [], [], []
        for j in range(len(ids)):
            for qid in probe_cells.get(int(cells[j]), ()):
                if ids[j] == qid:
                    continue
                out_q.append(qid)
                out_n.append(int(ids[j]))
                out_c.append(float(qm[q_index[qid]] @ mat[j]))
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_c})

    def global_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).head(k)

    local = ds.map_batches(local_topk, batch_format="pandas", batch_size=1024)
    return local.groupby("query_id").map_groups(global_topk, batch_format="pandas")


def knn_lsh(ds, k: int = 5, num_queries: int = 8, probes: int = 2,
            id_col: str = "vec_id", vec_col: str = "embedding"):
    """Sign-LSH bucketed ANN: corpus bucketed by hyperplane signs, each
    query searches its bucket plus all ``probes``-bit-flip probe
    buckets; candidates reduce to top-k as in the brute path."""
    import ray

    q_ids, q_mat = query_matrix(ds, num_queries, id_col, vec_col)
    dim = q_mat.shape[1]
    planes = _planes(dim)
    q_buckets = _bucket_of(q_mat, planes)
    # probe set per query: own bucket + single-bit flips (+2-bit flips)
    probe_map: dict = {}
    for qi, b in zip(q_ids, q_buckets):
        buckets = {int(b)}
        for i in range(NUM_PLANES):
            buckets.add(int(b) ^ (1 << i))
            if probes >= 2:
                for j in range(i + 1, NUM_PLANES):
                    buckets.add(int(b) ^ (1 << i) ^ (1 << j))
        for bucket in buckets:
            probe_map.setdefault(bucket, []).append(int(qi))
    ref = ray.put((q_ids, q_mat, probe_map))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qi, qm, probes_by_bucket = ray.get(ref)
        ids = batch[id_col].to_numpy()
        mat = _normalized(batch[vec_col])
        buckets = _bucket_of(mat, _planes(mat.shape[1]))
        out_q, out_n, out_c = [], [], []
        q_index = {int(q): i for i, q in enumerate(qi)}
        for j in range(len(ids)):
            for qid in probes_by_bucket.get(int(buckets[j]), ()):
                if ids[j] == qid:
                    continue
                sim = float(qm[q_index[qid]] @ mat[j])
                out_q.append(qid)
                out_n.append(int(ids[j]))
                out_c.append(sim)
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_c})

    def global_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).head(k)

    local = ds.map_batches(local_topk, batch_format="pandas", batch_size=1024)
    return local.groupby("query_id").map_groups(global_topk, batch_format="pandas")
