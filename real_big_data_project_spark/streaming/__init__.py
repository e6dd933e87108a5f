"""Structured Streaming operators.

The reference is strictly batch (SURVEY.md §2.12) — its per-day rollover
(etl/etl.py:672-676: when the file date changes, aggregate the finished day
and flush) is an incremental pattern that maps 1:1 onto a Structured
Streaming file source + 1-day tumbling window + watermark. This package is
the streaming restatement of those semantics.
"""
