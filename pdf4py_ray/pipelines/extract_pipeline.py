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
        return ds.sort(SORT_KEYS) if sort else ds

    ds.write_parquet(out_dir, partition_cols=["part_id"])
    _write_manifests(sf_dir, out_dir, skip or set(), params)
    return out_dir


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
    sort. This is what runs against the real 10^12-turn table."""
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
    return ds.sort(SORT_KEYS) if sort else ds


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
