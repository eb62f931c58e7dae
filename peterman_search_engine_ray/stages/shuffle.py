"""Shared hash-exchange helper.

Ray Data's ``repartition(num_blocks, keys=...)`` under the HASH_SHUFFLE
strategy is the engine's multi-node exchange: blocks move through the Ray
object store (plasma, spillable), every key group lands wholly in one
output block, and no stage ever touches a node-local path — the property
the north rule's fixed-size multi-node cluster requires.
"""

from __future__ import annotations

import ray
import ray.data


def hash_partition(ds: "ray.data.Dataset", keys: list[str],
                   num_parts: int) -> "ray.data.Dataset":
    """Hash-repartition so every key group lands wholly in one block
    (enables vectorized per-block group processing instead of per-group
    ``map_groups`` calls, whose ~50 ms/group Python+pandas overhead
    dominated with millions of tiny groups).

    Flips the DataContext to HASH_SHUFFLE for this chain (the setting is
    snapshotted into the Dataset at creation) and sizes the aggregator
    pool to the cluster: aggregator actors otherwise reserve
    ``0.0625 × partitions/aggregators`` CPUs each, which on a small
    cluster reserves everything and upstream map tasks starve behind the
    300 s aggregator wait."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    n_aggs = max(1, min(num_parts, cpus // 2))
    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        out = ds.repartition(num_parts, keys=keys)
        # a derived Dataset inherits its parent's snapshotted context, which
        # is what execution validates against — flip that one too
        out.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        out.context.max_hash_shuffle_aggregators = n_aggs
        out.context.min_hash_shuffle_aggregator_wait_time_in_s = 10
        out.context.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
        # downstream groupbys on this chain are hash-based too; the default
        # 200-partition plan serializes through the small aggregator pool
        out.context.default_hash_shuffle_parallelism = num_parts
        return out
    finally:
        ctx.shuffle_strategy = prev
