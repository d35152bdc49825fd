"""Explicit hash partitioning with salting for skewed conversations.

``part_id = crc32(conv_id) % P`` co-locates a conversation's turns and
fixes the output layout. Long conversations (hot keys) are *salted*:
when a conversation would exceed ``salt_turns`` turns in one
partition, its turns spread over sub-partitions keyed by
``turn_idx // salt_turns`` (north_rule: "salted repartitioning for
skewed long conversations"). Extraction is per-turn, so salting is
safe; the final stable sort restores conversation order.
"""

from __future__ import annotations

import zlib
from typing import Optional

import numpy as np
import pyarrow as pa


def conv_partition(conv_id: str, turn_idx: int, num_partitions: int,
                   salt_turns: Optional[int] = None) -> int:
    if salt_turns:
        salt = turn_idx // salt_turns
        if salt:
            return zlib.crc32(f"{conv_id}#{salt}".encode()) % num_partitions
    return zlib.crc32(conv_id.encode()) % num_partitions


def add_part_id(batch: pa.Table, num_partitions: int,
                salt_turns: Optional[int] = None) -> pa.Table:
    conv_ids = batch["conv_id"].to_pylist()
    turn_idx = batch["turn_idx"].to_pylist()
    part = np.fromiter(
        (conv_partition(c, t, num_partitions, salt_turns) for c, t in zip(conv_ids, turn_idx)),
        dtype=np.int32,
        count=len(conv_ids),
    )
    return batch.append_column("part_id", pa.array(part, type=pa.int32()))
