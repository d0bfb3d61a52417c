"""Relational + search operators (SURVEY.md §2): build, merge, stats,
top-k scoring, dedup family, similarity search, multimodal plumbing."""
