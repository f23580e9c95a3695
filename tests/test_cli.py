"""CLI surface: replay (both modes) → compact → browse → package, driven
through main() the way spark-submit would."""

import json
import zipfile

from kafka_plugins_spark.cli import main
from kafka_plugins_spark.datagen import generate_events, write_events


def test_cli_replay_mor_compact_roundtrip(spark, tmp_path, capsys):
    ev = str(tmp_path / "ev")
    tbl = str(tmp_path / "tbl")
    write_events(generate_events(spark, n_conversations=40, n_partitions=4, seed=3), ev)

    assert main(["replay", "--events", ev, "--table", tbl,
                 "--chunk-size", "300", "--mode", "mor"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied"] > 1 and out["rows_applied"] > 0 and out["watermarks"]

    assert main(["compact", "--table", tbl]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["skipped"] is False and out["snapshot_id"] is not None

    # replay again: fully fenced no-op, table unchanged
    assert main(["replay", "--events", ev, "--table", tbl,
                 "--chunk-size", "300", "--mode", "mor"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied"] == 0


def test_cli_package_zip_is_importable(tmp_path, capsys):
    out = str(tmp_path / "kps.zip")
    assert main(["package", "--out", out]) == 0
    names = zipfile.ZipFile(out).namelist()
    assert "kafka_plugins_spark/lake.py" in names
    assert all(n.startswith("kafka_plugins_spark/") for n in names)
    assert not any("__pycache__" in n for n in names)


def test_cli_replay_bucketed_roundtrip(spark, tmp_path, capsys):
    """spark-submit surface for mode=bucketed: chunked replay lands a
    bucketed table with the pinned n_buckets, re-replay is fenced."""
    import os

    from kafka_plugins_spark.lake import ParquetSnapshotTable

    ev = str(tmp_path / "ev")
    tbl = str(tmp_path / "tbl")
    write_events(generate_events(spark, n_conversations=40, n_partitions=4, seed=5), ev)

    assert main(["replay", "--events", ev, "--table", tbl,
                 "--chunk-size", "300", "--mode", "bucketed",
                 "--n-buckets", "8"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied"] > 1 and out["rows_applied"] > 0
    snap = ParquetSnapshotTable(spark, tbl).current_snapshot()
    assert snap["n_buckets"] == 8 and "bucket_paths" in snap

    assert main(["replay", "--events", ev, "--table", tbl,
                 "--chunk-size", "300", "--mode", "bucketed"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied"] == 0
