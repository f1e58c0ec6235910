"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.7 — 4 blocking MR jobs,
TfidfMapReduce.java:87-97); this package gives the engine the streaming
variants of the same semantics: incremental word count, watermarked
event-time windows, session windows, and a custom stateful sessionizer
via ``applyInPandasWithState``.
"""

from .sources import stream_documents, stream_events
from .runner import run_to_memory
from . import queries

__all__ = ["stream_documents", "stream_events", "run_to_memory", "queries"]
