"""Scalar-function surface (SURVEY.md §2.8): tokenizer, postings codec,
hashing, text analytics.  Vectorized pandas/Arrow UDFs only — no per-row
Python (input_hint mandate)."""
