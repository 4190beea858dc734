"""Structured Streaming layer: serde, the reference topology, windows."""
