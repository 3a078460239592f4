"""Flax backbones (BART/T5) with typed PET hook points + VL glue."""
