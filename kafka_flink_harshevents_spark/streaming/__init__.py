"""Streaming stage of the engine (SURVEY.md §2.10, §3.1).

- ``consumer`` — consumer-side ops: topic routing (O3), validation
  (F5-F7), latency derivation (P5/F9), grouped counters (A1).
- ``sessions`` — O9 stateful session consolidation
  (``applyInPandasWithState``, processing-time TTL).
"""
