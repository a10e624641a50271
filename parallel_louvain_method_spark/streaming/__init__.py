"""Structured Streaming surface.

The reference is batch-iterative only (SURVEY.md §2.8: no streaming
concept exists in /root/reference/src), and the north rule requires none.
This package provides one demonstrative streaming pipeline over the
``events`` table shape so the engine's batch operators compose with
``readStream`` when a deployment needs incremental edge ingest.
"""
