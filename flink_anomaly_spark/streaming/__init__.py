"""Structured Streaming surface: the live twins of the batch operators.

- pipelines: file-stream source → watermark → windowed agg → sinks
  (reference W1-W3 live; TestFlinkStreams.java:62-83)
- stateful: per-key running concatenation with GroupState
  (reference F1 live; Main.java:60-83)
- recovery: checkpoint/restart harness + failure injection
  (reference R1-R4; the at-least-once anomaly probe, inverted into an
  exactly-once invariant for Spark's replayable-source model)
"""
