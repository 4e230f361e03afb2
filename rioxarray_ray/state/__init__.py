"""Checkpoint manifests + lineage for resumable runs."""
