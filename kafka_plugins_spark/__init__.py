"""kafka_plugins_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch reimagining of the capabilities of the CDAP
``data-integrations/kafka-plugins`` connector suite (reference read-only at
``/root/reference``) as an idiomatic Spark engine:

- change-event scan (Kafka-shaped envelope: key/partition/offset/timestamp)
- watermarked dedup by ``(conv_id, turn_idx, offset)``
- last-writer-wins resolve (salted two-phase max-offset reduce)
- exactly-once MERGE into a lake table, fenced by per-partition offset
  ranges recorded atomically with every snapshot commit
- schema evolution via Arrow-schema reconciliation (vectorized, no
  per-row Python)
- checkpoint-resume + per-partition lineage and throughput metrics

The reference implements none of this relationally — its semantics are
offset-range partition scans, envelope projection, payload decode, offset
checkpoint/resume, and keyed produce (see SURVEY.md §2a). This package
re-expresses those semantics with the DataFrame API and Structured
Streaming, and adds the CDC table semantics from the north rule plus a
training-data operator library (dedup, similarity search, text analysis,
multimodal plumbing).
"""

__version__ = "0.1.0"

from kafka_plugins_spark.session import get_spark  # noqa: F401
