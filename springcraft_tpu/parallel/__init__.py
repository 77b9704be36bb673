"""Batched (vmap) and multi-chip (mesh/shard_map) execution of ENM
pipelines."""

__all__ = []
