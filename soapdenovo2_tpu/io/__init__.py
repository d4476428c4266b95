"""Host-side IO: read ingestion (FASTA/FASTQ/gz), stage file protocol."""
