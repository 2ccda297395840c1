"""DataFrame operators: postings, BM25, fuzzy, fusion, dedup, similarity."""
