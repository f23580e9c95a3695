"""Operator library: CDC resolve/apply + training-data-pipeline operators."""
