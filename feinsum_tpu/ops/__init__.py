"""Pallas kernel emitters — the TPU compute path."""
