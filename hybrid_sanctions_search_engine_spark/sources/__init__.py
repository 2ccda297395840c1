"""Table loaders and index shard I/O (manifests, resumable builds)."""
