"""Deterministic string hashing shared by dedup / tokenize stages.

Python's builtin hash() is salted per process — useless for distributed
dedup — so everything uses FNV-1a."""

from __future__ import annotations


def hash_str(s: str) -> int:
    """Deterministic 64-bit FNV-1a."""
    h = 14695981039346656037
    for c in s.encode():
        h = ((h ^ c) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h
