"""Streaming: incremental extraction over a growing corpus directory.

The reference is strictly batch (SURVEY.md §2.9 — no watermarks, windows, or
stateful ops exist there), and the north_rule keeps the graft batch with
snapshot resume. This module exists for the incremental-ingest use case the
reference's dormant `--resume` gestures at: new repo_files landing in a
directory are extracted exactly once, with per-batch manifest commits.
"""
