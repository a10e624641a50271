"""Structured Streaming surface.

The reference is batch-iterative only (SURVEY.md §2.8: no streaming
concept exists in /root/reference/src), and the north rule requires none.
This package carries the streaming twins a deployment needs anyway:
windowed activity aggregates, the streaming co-commit pair builder, and
stateful sessionization over the ``events`` shape (``events.py``, each
parity-tested against its batch twin), plus continuous edge-table
maintenance — ``ingest.py``'s foreachBatch incremental merge into
versioned exactly-once state, parity-tested against the full rebuild.
"""
