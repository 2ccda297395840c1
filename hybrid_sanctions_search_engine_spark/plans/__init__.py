"""Driver-side query plans: block-max pruned top-k BM25, hybrid escalation."""
