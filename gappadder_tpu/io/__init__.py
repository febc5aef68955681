"""Host-side I/O: FASTA / FASTQ / BAM readers producing columnar arrays."""
