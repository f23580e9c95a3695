import pytest

from kafka_plugins_spark.datagen import generate_events, write_events
from kafka_plugins_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark("kafka_plugins_spark-tests", cores=8, shuffle_partitions=8)


@pytest.fixture(scope="session")
def events_path(spark, tmp_path_factory):
    """Small deterministic CDC event log (FIXTURES.md §2, scale `small`)."""
    path = str(tmp_path_factory.mktemp("cdc") / "events")
    df = generate_events(spark, n_conversations=150, n_partitions=4, seed=42)
    write_events(df, path)
    return path


@pytest.fixture(scope="session")
def skew_events_path(spark, tmp_path_factory):
    """Hot-conversation fixture: conv 0 gets a large share of events."""
    path = str(tmp_path_factory.mktemp("cdc_skew") / "events")
    df = generate_events(
        spark, n_conversations=60, n_partitions=4, seed=7, hot_updates_per_turn=40
    )
    write_events(df, path)
    return path
