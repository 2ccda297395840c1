"""Incremental index maintenance (delta overlay + compaction + streaming)."""
