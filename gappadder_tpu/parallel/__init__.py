"""Mesh construction, sharded pipeline steps, collectives (L3 scale-out)."""
