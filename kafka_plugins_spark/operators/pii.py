"""PII / secret scrubbing for training-data pipelines.

Regex-class redaction as pure JVM ``regexp_replace`` chains with
per-class match counts — the standard pre-training scrub stage (emails,
phone numbers, SSN-shaped ids, IPv4 literals, key-shaped strings). No
Python in the hot path: counting is ``regexp_count`` and redaction is a
fixed chain of 5 ``regexp_replace`` passes, all whole-stage codegen.

Patterns are deliberately engine-portable (no backreferences, no
lookaround): Spark compiles them with java.util.regex, the DuckDB
oracle with RE2 — both leftmost-first with identical semantics for this
subset, which is what lets the driver row hash-match. Keep the two in
sync with ``PII_CLASSES``.

Redaction order is the list order; counts are measured on the ORIGINAL
text (each class independently), so a span matched by two classes is
counted by both but redacted by the first — deterministic either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (class name, portable regex, replacement token)
PII_CLASSES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    (
        "phone",
        r"\+[0-9]{1,2}[ -][0-9]{3}[ -][0-9]{3}[ -]?[0-9]{4}"
        r"|\([0-9]{3}\) [0-9]{3}-[0-9]{4}"
        r"|\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
        "<PHONE>",
    ),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    (
        "secret",
        r"\b(?:sk|pk|key|tok|ghp)_[A-Za-z0-9]{16,}\b|\b[A-Fa-f0-9]{32,}\b",
        "<KEY>",
    ),
]


def scrub_pii(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact PII classes from ``text_col`` and count matches per class.

    Returns ``(doc_id, n_email, n_ssn, n_phone, n_ipv4, n_secret,
    clean_text)``. At 100 TB this is a pure projection — zero exchanges,
    one codegen stage; the 6 regex passes per row are the entire cost
    and they scan each document independently, so it parallelizes
    perfectly and composes with the quality suite
    (:func:`kafka_plugins_spark.operators.text.with_quality_metrics`)
    in the same stage.
    """
    c = F.col(text_col)
    counts = {
        f"n_{name}": F.regexp_count(c, F.lit(pat)).cast("long")
        for name, pat, _ in PII_CLASSES
    }
    clean = c
    for _, pat, rep in PII_CLASSES:
        clean = F.regexp_replace(clean, pat, rep)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[v.alias(k) for k, v in counts.items()],
        clean.alias("clean_text"),
    )
