"""CLI entry points (train, generate) — exposed as console scripts."""
