"""Structured Streaming ingest: the production tail→upsert path."""
