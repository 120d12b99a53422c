"""Structured Streaming jobs (the reference has no streaming subsystem —
SURVEY §2.11; these are the honest Spark-native additions)."""
