"""Assembly pipeline stages (the framework's "model families"):
pregraph, contig, map, scaff, sparse-pregraph, fusion."""
