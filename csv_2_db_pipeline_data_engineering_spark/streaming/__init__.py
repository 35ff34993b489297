"""Structured Streaming extensions (SURVEY.md §7 slice 6).

The reference is explicitly batch-only (docs/documentation.md:35-39) but
names "no file delivery detection" as a known limitation
(docs/documentation.md:208); these modules are the Spark-native answer.
"""
