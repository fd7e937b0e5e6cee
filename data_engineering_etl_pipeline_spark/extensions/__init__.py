"""North-star extension operators for large-scale training-data pipelines
(SURVEY.md §2.11, BASELINE.json): deduplication, similarity search, text
analysis, multimodal column plumbing — each designed shuffle-aware for
100 TB and exposed as oracle-checked queries where SQL-expressible.
"""
