"""Kafka source/sink option construction — the production ingress path.

Pure functions (no broker needed) reproducing the reference's offset and
partition semantics as ``spark.readStream.format("kafka")`` options:

- S2 initial-offset resolution: −2 → earliest, −1 → latest sentinels,
  per-partition overrides merged over a default
  (``KafkaConfig.java:79-99,200-212,372-412``)
- S3 saved-state validation: resume offset must lie within the broker's
  [earliest, latest] per partition, errors aggregated
  (``KafkaStreamingSourceUtil.java:202-220``)
- S4 partition-subset assignment (``KafkaStreamingSourceUtil.java:227-241``)
- S5 rate limiting: maxRatePerPartition → maxOffsetsPerTrigger
  (``KafkaStreamingSource.java:83-87``, default 1000/s/partition
  ``KafkaConfig.java:155-159``)
"""

from __future__ import annotations

import json

EARLIEST = -2  # sentinel, as the reference's kafka.api.OffsetRequest.EarliestTime
LATEST = -1


def resolve_starting_offsets(
    topic: str,
    partitions: list[int],
    default_offset: int = EARLIEST,
    overrides: dict[int, int] | None = None,
) -> str:
    """Build the ``startingOffsets`` option value.

    All-partitions sentinel with no overrides collapses to the compact
    forms "earliest"/"latest"; otherwise a per-partition JSON map using
    Spark's own sentinels (-2 earliest, -1 latest — same values the
    reference uses).
    """
    overrides = overrides or {}
    if not overrides and default_offset in (EARLIEST, LATEST):
        return "earliest" if default_offset == EARLIEST else "latest"
    per_part: dict[str, int] = {}
    for p in partitions:
        off = overrides.get(p, default_offset)
        if off < 0 and off not in (EARLIEST, LATEST):
            raise ValueError(f"invalid offset {off} for partition {p}")
        per_part[str(p)] = off
    return json.dumps({topic: per_part})


def validate_saved_offsets(
    saved: dict[int, int],
    earliest: dict[int, int],
    latest: dict[int, int],
) -> None:
    """Reject resume when a saved offset fell off the retention window.

    Mirrors the reference's aggregated error message
    (``KafkaStreamingSourceUtil.java:202-220``): every out-of-range
    partition is reported, not just the first.
    """
    problems = []
    for p, off in sorted(saved.items()):
        lo = earliest.get(p)
        hi = latest.get(p)
        if lo is None or hi is None:
            problems.append(f"partition {p}: not present on broker")
        elif not (lo <= off <= hi):
            problems.append(
                f"partition {p}: saved offset {off} outside valid range [{lo}, {hi}]"
            )
    if problems:
        raise ValueError(
            "Saved offsets are out of range; clear state or set offsets explicitly. "
            + "; ".join(problems)
        )


def partition_assignment(topic: str, partitions: list[int]) -> str:
    """``assign`` option JSON for a partition subset (S4)."""
    return json.dumps({topic: sorted(partitions)})


def max_offsets_per_trigger(
    max_rate_per_partition: int,
    n_partitions: int,
    trigger_interval_sec: float = 1.0,
) -> int:
    """Translate the reference's per-partition records/sec budget into
    Spark's per-trigger total cap (divided across partitions by Spark)."""
    return max(1, int(max_rate_per_partition * n_partitions * trigger_interval_sec))


def kerberos_jaas_config(principal: str, keytab: str) -> dict[str, str]:
    """SASL/GSSAPI options for a kerberized cluster (V2).

    Mirrors the reference's JAAS string injection
    (``KafkaHelpers.java:99-116``); principal+keytab must come as a pair
    (enforced by config validation, ``KafkaHelpers.java:124-149``).
    """
    jaas = (
        "com.sun.security.auth.module.Krb5LoginModule required "
        "useKeyTab=true storeKey=true "
        f'keyTab="{keytab}" principal="{principal}";'
    )
    return {
        "kafka.security.protocol": "SASL_PLAINTEXT",
        "kafka.sasl.mechanism": "GSSAPI",
        "kafka.sasl.kerberos.service.name": "kafka",
        "kafka.sasl.jaas.config": jaas,
    }


def kafka_stream_options(
    brokers: str,
    topic: str,
    partitions: list[int] | None = None,
    starting_offsets: str = "earliest",
    max_rate_per_partition: int = 1000,
    n_partitions: int = 1,
    trigger_interval_sec: float = 1.0,
    fail_on_data_loss: bool = True,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Full option map for ``spark.readStream.format("kafka")``."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
        "maxOffsetsPerTrigger": str(
            max_offsets_per_trigger(max_rate_per_partition, n_partitions, trigger_interval_sec)
        ),
    }
    if partitions is None:
        opts["subscribe"] = topic
    else:
        opts["assign"] = partition_assignment(topic, partitions)
    opts.update(extra or {})
    return opts
