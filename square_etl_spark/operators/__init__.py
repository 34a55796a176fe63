"""Operator library — SURVEY.md §2 re-expressed Spark-first.

Modules:

- ``projections``  — P1–P9 projections/filters + F1–F9 scalar funcs
- ``joins``        — J1 broadcast build/probe, J2 first-wins, J3 equi
                     lookup, J4 explode
- ``aggregations`` — A1–A3 + the standard agg surface (rollup/cube,
                     top-k, set ops) and deterministic decimal sums
- ``windows``      — tumbling/sliding event-time windows (T1/T2)
- ``quality``      — E1/E2 quarantine split and assertions
- ``dedup``        — exact / MinHash-LSH / SimHash / n-gram Jaccard
- ``text``         — language-ID, quality scoring, tokens, fingerprints
- ``similarity``   — embedding cosine top-k (brute force + LSH bucketed)
- ``multimodal``   — binary-column plumbing with stubbed codecs
"""
