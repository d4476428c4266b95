"""Device-mesh parallelism: hash-sharded k-mer tables + all-to-all routing."""
