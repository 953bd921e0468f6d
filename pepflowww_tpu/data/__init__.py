"""Host-side data pipeline: PDB IO, LMDB dataset, collate, synthetic data."""
