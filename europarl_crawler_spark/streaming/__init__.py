"""Structured Streaming surface: the crawl log as an unbounded stream."""
