"""Ray Data pipeline stages (map_batches / groupby / sort compositions)."""
