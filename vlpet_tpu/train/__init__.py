"""Trainer: freezing engine, optimizer, train/eval steps, checkpointing."""
