"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.8: MapReduce jobs + online
single-statement SAIL writes, sail/.../HBaseSail.java:482-502) — streaming
here is the beyond-reference capability set: watermarked windowed
aggregation and incremental triple ingest.
"""
