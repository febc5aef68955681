"""Device-side batched ops and Pallas kernels (L0/L2 of SURVEY.md §7)."""
