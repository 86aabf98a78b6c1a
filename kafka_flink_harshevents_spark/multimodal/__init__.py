"""Multimodal columns: opaque binary media + typed metadata
(north-star extension; SURVEY.md §7.8).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. Decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages — the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested; the codec
itself is a deterministic fake because no image/audio library ships in
this container (gated behind an import-try; see ``media._try_real_decoder``).
"""
