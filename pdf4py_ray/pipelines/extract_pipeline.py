"""The flagship pipeline: transcript turns → extracted main content.

Lifecycle (SURVEY §3.4):

    read/synthesize turns                       # stateless, column-pruned
      → add part_id (hash(conv_id) % P, salted) # stateless map_batches
      → ExtractTurns actor pool                 # stateful map_batches, pyarrow batches
      → sort(conv_id, turn_idx)                 # stable order for the equality gate
      → write_parquet(partition_cols=[part_id]) # + per-partition manifests

Everything stays a lazy streaming ``Dataset`` until a terminal
consume; no mid-pipeline materialization.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

from ..sources.transcripts import synth_transcripts
from ..stages.extract import ExtractTurns
from ..stages.partition import add_part_id
from . import checkpoint

__PIPELINE_VERSION__ = "r1.0"

SORT_KEYS = ["conv_id", "turn_idx"]


def extraction_dataset(
    turns_ds,
    num_partitions: int = 32,
    salt_turns: Optional[int] = 16,
    concurrency=(2, 8),
    batch_size: int = 32,
    skip_partitions: Optional[set] = None,
):
    """Wire the extraction stages onto an existing turns Dataset."""
    from ..config import apply_engine_defaults

    apply_engine_defaults()
    ds = turns_ds.map_batches(
        functools.partial(add_part_id, num_partitions=num_partitions, salt_turns=salt_turns),
        batch_format="pyarrow",
    )
    if skip_partitions:
        skip = skip_partitions

        def drop_done(batch):
            import numpy as np
            import pyarrow.compute as pc
            import pyarrow as pa

            mask = pa.array(
                ~_np_isin(batch["part_id"].to_numpy(zero_copy_only=False), skip)
            )
            return batch.filter(mask)

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    return ds.map_batches(
        ExtractTurns,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def _np_isin(values, skip: set):
    import numpy as np

    arr = np.asarray(sorted(skip))
    return np.isin(values, arr)


def run_extraction(
    sf_dir: str,
    out_dir: Optional[str] = None,
    num_partitions: int = 32,
    salt_turns: Optional[int] = 16,
    concurrency=(2, 8),
    batch_size: int = 32,
    sort: bool = True,
    resume: bool = True,
    repeat: int = 1,
):
    """Run the flagship pipeline over a scale-factor directory.

    Returns the result Dataset when ``out_dir`` is None, else writes
    partitioned parquet + manifests and returns the output path.
    """
    turns = synth_transcripts(sf_dir, repeat=repeat)
    params = {"num_partitions": num_partitions, "salt_turns": salt_turns,
              "repeat": repeat}
    skip = None
    if out_dir is not None:
        if resume:
            skip = checkpoint.completed_partitions(out_dir)
            if skip:
                checkpoint.verify_resume_params(out_dir, skip, params)
            # a crashed mid-write run leaves manifest-less partial
            # partitions; delete them before rewriting or write_parquet
            # appends duplicates the manifest pass would then bless
            checkpoint.clear_incomplete(out_dir)
        else:
            checkpoint.clear_all(out_dir)
    ds = extraction_dataset(
        turns,
        num_partitions=num_partitions,
        salt_turns=salt_turns,
        concurrency=concurrency,
        batch_size=batch_size,
        skip_partitions=skip,
    )
    if out_dir is None:
        if not sort:
            return ds
        if sort == "full":
            return ds.sort(SORT_KEYS)
        # range sort: conv_id embeds the zero-padded doc_id, so split
        # points come from the (tiny) documents id column
        return range_sorted(ds, _split_points_from_docs(sf_dir))

    ds.write_parquet(out_dir, partition_cols=["part_id"])
    _write_manifests(sf_dir, out_dir, skip or set(), params)
    return out_dir


def _split_points_from_docs(sf_dir: str, num_buckets: int = 64) -> list:
    """conv_id range-split points for the synthesized corpus: quantiles
    of the documents id column formatted with the synthesis naming
    (``conv-{doc_id:08d}``, lexicographic order == numeric order;
    ``-rNN`` repeat suffixes sort inside their base conversation)."""
    import numpy as np
    import pyarrow.parquet as pq

    ids = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_numpy()
    if len(ids) < num_buckets:
        return sorted({f"conv-{int(i):08d}" for i in ids})[1:]
    qs = np.quantile(ids, np.arange(1, num_buckets) / num_buckets)
    return sorted({f"conv-{int(q):08d}" for q in qs})


def sample_split_points(turns_dir: str, num_buckets: int = 64,
                        per_file: int = 8192) -> list:
    """Range-sort split points: sample ``conv_id`` from a spread of the
    input parquet files (column-pruned, bounded rows per file) and take
    ``num_buckets - 1`` quantiles. At 10^12 turns this reads a few row
    groups of one string column — O(sample), never O(corpus)."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(turns_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {turns_dir}")
    step = max(1, len(files) // 8)
    vals: list = []
    for f in files[::step][:8]:
        col = pq.read_table(f, columns=["conv_id"])["conv_id"]
        vals.extend(col.slice(0, per_file).to_pylist())
    vals.sort()
    if len(vals) < num_buckets:
        return vals[1:]
    idx = (np.arange(1, num_buckets) * len(vals)) // num_buckets
    return sorted(set(vals[i] for i in idx))


def range_sorted(ds, split_points: list, sort_keys=None, keep_bucket: bool = True):
    """Stable global sort as ONE coarse bucket shuffle instead of Ray's
    sample→map→reduce sort operator (whose fixed all-to-all cost does
    not amortize at bench size — gate-shape scaling was 0.59 with it).

    Rows are range-tagged by ``searchsorted(split_points, conv_id)``;
    a single int64-key ``groupby`` co-locates each range; the
    per-bucket sort is one vectorized pandas ``sort_values``. Bucket
    ``b`` holds exactly the keys between split ``b-1`` and ``b``, so
    consuming (or writing) buckets in ascending order IS the stable
    global (conv_id, turn_idx) order — the ordered-write path
    partitions output by ``sort_bucket``."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    keys = sort_keys or SORT_KEYS
    splits_ref = ray.put(np.array(split_points))  # unicode dtype: C-speed searchsorted

    def tag(batch: pa.Table) -> pa.Table:
        sp = ray.get(splits_ref)
        # one C-level Arrow→numpy conversion of the key column (object
        # dtype) — never a per-row to_pylist materialization
        vals = batch[keys[0]].to_numpy(zero_copy_only=False)
        bucket = np.searchsorted(sp, vals, side="right").astype(np.int64)
        return batch.append_column("sort_bucket", pa.array(bucket, type=pa.int64()))

    def sort_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out = group.sort_values(keys, kind="mergesort")
        return out if keep_bucket else out.drop(columns=["sort_bucket"])

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("sort_bucket")
        .map_groups(sort_bucket, batch_format="pandas")
    )


def stable_sorted_write(ds, out_dir: str, split_points: list,
                        sort_keys=None) -> int:
    """Stable global sort as an EXTERNAL sort with no object-store
    all-to-all — the ordered-write gate/production shape.

    Stage 1 (streaming, no shuffle): rows are range-tagged by
    ``searchsorted(split_points, conv_id)`` and written with
    ``write_parquet(partition_cols=["sort_bucket"])`` — every task
    appends its own fragment files under each bucket's hive directory,
    so the data movement is task→storage, never task→task.

    Stage 2 (embarrassingly parallel): one Ray task per bucket reads
    its fragments (bucket ≈ corpus/B rows), sorts in memory with one
    vectorized ``Table.sort_by``, writes a single ``sorted.parquet``
    and removes the fragments. Bucket ``b`` holds exactly the keys
    between split ``b-1`` and ``b``, so reading ``sort_bucket=0..B``
    in order IS the stable global (conv_id, turn_idx) order.

    Both stages scale linearly with nodes (storage-bandwidth bound,
    not interconnect-barrier bound). All filesystem access goes
    through ``pyarrow.fs`` resolved from the output URI — POSIX paths
    and object-store URIs (``file://``, ``s3://``, …) take the same
    code path; the fragment cleanup uses per-file deletes and a
    filesystem ``move`` (atomic on local FS, copy+delete where the
    store lacks rename) rather than POSIX ``glob``/``os.replace``.
    Returns the total row count."""
    import numpy as np
    import pyarrow as pa
    import ray

    filesystem, out_path = _resolve_fs(out_dir)
    keys = sort_keys or SORT_KEYS
    splits_arr = np.array(split_points)
    splits_ref = ray.put(splits_arr)

    def tag(batch: pa.Table) -> pa.Table:
        sp = ray.get(splits_ref)
        vals = batch[keys[0]].to_numpy(zero_copy_only=False)
        bucket = np.searchsorted(sp, vals, side="right").astype(np.int64)
        return batch.append_column("sort_bucket", pa.array(bucket, type=pa.int64()))

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        out_path, filesystem=filesystem, partition_cols=["sort_bucket"]
    )

    @ray.remote(num_cpus=1)
    def compact(bucket_dir: str) -> int:
        from pyarrow import fs as pafs

        import pyarrow.parquet as pqmod

        infos = filesystem.get_file_info(pafs.FileSelector(bucket_dir))
        frags = sorted(
            fi.path for fi in infos
            if fi.type == pafs.FileType.File and fi.base_name.endswith(".parquet")
            and not fi.base_name.startswith("sorted.parquet")
        )
        if not frags:
            return 0
        t = pa.concat_tables(pqmod.read_table(f, filesystem=filesystem) for f in frags)
        t = t.sort_by([(k, "ascending") for k in keys])
        tmp = f"{bucket_dir}/sorted.parquet.tmp"
        pqmod.write_table(t, tmp, filesystem=filesystem)
        filesystem.move(tmp, f"{bucket_dir}/sorted.parquet")
        for f in frags:
            filesystem.delete_file(f)
        return t.num_rows

    from pyarrow import fs as pafs

    bucket_dirs = sorted(
        fi.path for fi in filesystem.get_file_info(pafs.FileSelector(out_path))
        if fi.type == pafs.FileType.Directory
        and fi.base_name.startswith("sort_bucket=")
    )
    counts = ray.get([compact.remote(d) for d in bucket_dirs])
    return int(sum(counts))


def _resolve_fs(path: str):
    """(pyarrow FileSystem, in-filesystem path) for a path or URI.
    Bare paths resolve to LocalFileSystem; ``file://``, ``s3://`` etc.
    go through ``FileSystem.from_uri``. The returned filesystem object
    is picklable, so Ray tasks can capture it."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), os.path.abspath(path)


def materialize_turns(sf_dir: str, out_dir: str, repeat: int = 1) -> str:
    """One-time synthesis of the transcript turn table to Parquet.

    The mission input (BASELINE.json input_hint) is a *Parquet table of
    transcript turns*; synthesis only exists because the driver test
    data has no such table. Benchmarks materialize it once (untimed)
    and measure the actual pipeline: read_parquet → extract → sort.
    Idempotent via a done-marker."""
    import json
    import os

    marker = os.path.join(out_dir, "_DONE.json")
    if os.path.exists(marker):
        return out_dir
    ds = synth_transcripts(sf_dir, repeat=repeat)
    ds.write_parquet(out_dir)
    with open(marker, "w") as fh:
        json.dump({"sf_dir": sf_dir, "repeat": repeat}, fh)
    return out_dir


def extraction_from_parquet(
    turns_dir: str,
    num_partitions: int = 64,
    salt_turns: Optional[int] = 16,
    concurrency=(2, 8),
    batch_size: Optional[int] = None,
    sort: bool = True,
):
    """The production-shaped pipeline: column-pruned Parquet scan of
    transcript turns → partition tag → extraction actor pool → stable
    sort. This is what runs against the real 10^12-turn table.

    ``sort``: ``"range"`` (the default gate shape) applies
    :func:`range_sorted` — split points sampled from the input, one
    bucket shuffle, per-bucket vectorized sort, output stably ordered
    when consumed bucket-ascending; ``"full"`` uses Ray's built-in
    sort operator; falsy skips sorting (production shape)."""
    import ray.data as rd

    from ..config import apply_engine_defaults

    apply_engine_defaults()
    turns = rd.read_parquet(
        turns_dir, columns=["conv_id", "turn_idx", "text", "tool"]
    )
    ds = extraction_dataset(
        turns,
        num_partitions=num_partitions,
        salt_turns=salt_turns,
        concurrency=concurrency,
        batch_size=batch_size,
    )
    if not sort:
        return ds
    if sort == "full":
        return ds.sort(SORT_KEYS)
    splits = sample_split_points(turns_dir, num_buckets=max(64, num_partitions))
    return range_sorted(ds, splits)


def _write_manifests(sf_dir: str, out_dir: str, already_done: set,
                     params: Optional[dict] = None) -> None:
    """Post-write per-partition metrics → manifests (cheap column-pruned
    read-back of the freshly written output)."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    out = rd.read_parquet(out_dir, columns=["part_id", "n_bytes", "status"])

    def flag_errors(batch):
        err = pc.cast(pc.equal(batch["status"], "error"), "int64")
        return batch.append_column("is_error", err)

    metrics = (
        out.map_batches(flag_errors, batch_format="pyarrow")
        .groupby("part_id")
        .aggregate(Count(alias_name="rows"), Sum("n_bytes", alias_name="payload_bytes"),
                   Sum("is_error", alias_name="errors"))
    )
    lineage = {
        "pipeline_version": __PIPELINE_VERSION__,
        "input": sf_dir,
        "stages": ["synth_transcripts", "add_part_id", "ExtractTurns"],
        # partitioning params: resume refuses to run with different
        # values (completed part_ids are filtered from the INPUT, so a
        # changed partitioning would skip the wrong row subsets)
        "params": params,
    }
    for row in metrics.iter_rows():
        part_id = int(row["part_id"])
        if part_id in already_done:
            continue
        checkpoint.write_manifest(
            out_dir,
            part_id,
            {
                "rows": int(row["rows"]),
                "payload_bytes": int(row["payload_bytes"] or 0),
                "errors": int(row["errors"] or 0),
            },
            lineage,
        )
