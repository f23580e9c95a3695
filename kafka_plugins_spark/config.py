"""Pipeline configuration with collect-all validation.

The reference validates its plugin config with a ``FailureCollector`` that
gathers every problem before failing (``KafkaConfig.java:483-545``,
``KafkaBatchConfig.java:310-353``). Same contract here: ``validate()``
raises one ``ConfigError`` listing all violations.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_BROKER_RE = re.compile(r"^[\w.\-]+:\d{1,5}$")


class ConfigError(ValueError):
    def __init__(self, failures: list[str]):
        self.failures = failures
        super().__init__("invalid config: " + "; ".join(failures))


@dataclass
class IngestConfig:
    """Config for the CDC ingest job (streaming or batch replay)."""

    events_path: str = ""  # parquet event log (sandbox) — or empty if Kafka
    brokers: str = ""  # host:port[,host:port...] — or empty if file source
    topic: str = ""
    table_path: str = ""
    checkpoint_path: str = ""
    partitions: list[int] | None = None  # subset, None = all
    initial_offsets: dict[int, int] = field(default_factory=dict)
    default_initial_offset: int = -2  # earliest
    max_rate_per_partition: int = 1000
    max_records_per_partition: int | None = None
    salt_buckets: int = 8
    chunk_size: int | None = None
    principal: str | None = None  # kerberos (pass-through, prod only)
    keytab: str | None = None

    def validate(self) -> "IngestConfig":
        f: list[str] = []
        if not self.events_path and not self.brokers:
            f.append("one of events_path or brokers is required")
        if self.brokers:
            for b in self.brokers.split(","):
                if not _BROKER_RE.match(b.strip()):
                    f.append(f"broker {b.strip()!r} is not host:port")
            if not self.topic:
                f.append("topic is required with brokers")
        if not self.table_path:
            f.append("table_path is required")
        if self.partitions is not None:
            for p in self.partitions:
                if p < 0:
                    f.append(f"partition {p} is negative")
        for p, off in self.initial_offsets.items():
            if off < -2:
                f.append(f"initial offset {off} for partition {p} is invalid (< -2)")
        if self.max_rate_per_partition <= 0:
            f.append("max_rate_per_partition must be positive")
        if self.max_records_per_partition is not None and self.max_records_per_partition <= 0:
            f.append("max_records_per_partition must be positive")
        if self.salt_buckets < 1:
            f.append("salt_buckets must be >= 1")
        if self.chunk_size is not None and self.chunk_size < 1:
            f.append("chunk_size must be >= 1")
        # kerberos must be configured as a pair (KafkaHelpers.java:124-149)
        if bool(self.principal) != bool(self.keytab):
            f.append("principal and keytab must both be set or both be empty")
        if f:
            raise ConfigError(f)
        return self
