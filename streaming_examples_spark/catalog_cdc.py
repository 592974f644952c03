"""Catalog entries: CDC ingest modes + transactional processing.

Filled in as the CDC layer lands (SURVEY.md §2.1, §2.6).
"""
