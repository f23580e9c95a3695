"""Sources: offset-range event scans (batch) and Kafka option builders."""
