"""Batch operators.

firehose.py   - the reference's own operator surface (SURVEY.md §2.A)
relational.py - relational breadth supplied by Spark built-ins (§2.B)
asof.py       - as-of / range joins
dedup.py      - exact + near-duplicate detection (§2.C)
similarity.py - vector similarity search (§2.C)
text.py       - text analysis (§2.C)
multimodal.py - multimodal column handling (§2.C)
"""
