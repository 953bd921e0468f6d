"""Misc utilities: logging, seeding, metric accumulation, run dirs."""
