"""Cluster-sizing arithmetic invariants (sri_spark/tuning.py)."""

from __future__ import annotations

import pytest

from sri_spark.tuning import (
    MAX_SHUFFLE_PARTITIONS,
    TARGET_PARTITION_BYTES,
    cluster_conf,
    shuffle_partitions,
)

TB = 2**40


def test_partition_sizing_targets_128mib_per_task():
    # 100 TB full shuffle on 1000 x 8-core executors
    parts = shuffle_partitions(100 * TB, 8000)
    assert parts * TARGET_PARTITION_BYTES >= 100 * TB  # nothing oversized
    assert parts <= MAX_SHUFFLE_PARTITIONS


def test_parallelism_floor_for_small_shuffles():
    # 1 GiB shuffle on a big cluster must still use every core twice over
    assert shuffle_partitions(2**30, 8000) == 16000


def test_conf_is_runtime_consistent():
    conf = cluster_conf(100 * TB, executors=1000, cores_per_executor=8)
    parts = int(conf["spark.sql.shuffle.partitions"])
    assert parts == shuffle_partitions(100 * TB, 8000)
    assert conf["spark.sql.adaptive.enabled"] == "true"
    advisory = int(conf["spark.sql.adaptive.advisoryPartitionSizeInBytes"])
    assert advisory <= TARGET_PARTITION_BYTES


def test_shuffle_fraction_scales_partitions_down():
    full = cluster_conf(100 * TB, executors=1000, cores_per_executor=8)
    filtered = cluster_conf(
        100 * TB, executors=1000, cores_per_executor=8, shuffle_fraction=0.1
    )
    assert int(filtered["spark.sql.shuffle.partitions"]) < int(
        full["spark.sql.shuffle.partitions"]
    )


def test_rejects_bad_args():
    with pytest.raises(ValueError):
        cluster_conf(0, executors=10)
    with pytest.raises(ValueError):
        cluster_conf(1, executors=10, shuffle_fraction=1.5)
