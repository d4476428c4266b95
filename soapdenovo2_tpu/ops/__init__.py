"""Device-side primitive ops: multiword k-mer math, sort-based counting,
vectorized multiword search, batched alignment kernels."""
