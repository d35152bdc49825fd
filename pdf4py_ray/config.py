"""Engine-level Ray Data tuning.

``apply_engine_defaults`` is called from every pipeline entry point
(idempotent, cheap). The one non-default that matters:

- ``_max_num_blocks_in_streaming_gen_buffer``: Ray 2.49's streaming
  executor consumes task outputs from a scheduler loop whose
  ``ray.wait`` cycle runs at ~10-100 ms. With the default buffer of 2
  blocks per streaming generator, every map task stalls after two
  output blocks until the loop consumes one — measured 14 s for a
  2-s-of-CPU synthesis stage (256 blocks at 32 CPUs). A 32-block
  buffer lets tasks run ahead of the consumer loop and restores
  near-raw-task throughput (14.3 s → 2.4 s on the same stage). The
  cost is bounded extra object-store usage per in-flight task
  (32 × target block size), irrelevant against a 37 GiB store and
  spilling at 100 TB scale.
"""

from __future__ import annotations

import logging

GEN_BUFFER_BLOCKS = 32

_applied = False


class _EmptySchemaWarningFilter(logging.Filter):
    """Drop Ray 2.49's 'RefBundle with a different schema' warning ONLY
    when the *new* schema is empty: sort-shuffle reduce partitions that
    received zero rows emit schema-less empty blocks (Ray-internal —
    the engine's own group kernels already return typed empty tables),
    which downstream schema unification handles fine. Genuine
    schema-vs-schema mismatches still log."""

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        if "different schema" not in msg:
            return True
        # empty new schema renders as "." (Arrow) or as a columnless
        # PandasBlockSchema, depending on the empty block's format
        return not ("new schema: ." in msg
                    or "new schema: PandasBlockSchema(names=[], types=[])" in msg)


def apply_engine_defaults() -> None:
    global _applied
    if _applied:
        return
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx._max_num_blocks_in_streaming_gen_buffer = GEN_BUFFER_BLOCKS
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaWarningFilter())
    _applied = True
