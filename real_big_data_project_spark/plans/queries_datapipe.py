"""Training-data pipeline queries (dedup families, similarity search, text
analysis, multimodal plumbing) — filled in as ``..datapipe`` lands."""

from __future__ import annotations
