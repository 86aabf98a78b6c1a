"""Sources & sinks (SURVEY.md §2.1-2.2).

- ``kafka``     — Kafka read/write wiring (S2, S3, K1, K2).
- ``files``     — batch file sources (S4) and append sinks (K7).
- ``synthetic`` — seeded telemetry generator (S5), batch + streaming.
"""
