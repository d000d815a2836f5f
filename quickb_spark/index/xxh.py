"""Vectorized + chained xxHash64, bit-identical to Spark's `F.xxhash64`.

The direct phase-1 build tasks (index/p1_direct.py) mint doc_ids and term
hashes in Python but MUST produce the same values as the JVM expressions
used by the in-channel build path and the query planner:

  doc_id = F.xxhash64("repo", "path", "commit", chunk_idx)   (strings + int)
  term_h = F.xxhash64("term")                                 (string)
  salt   = F.pmod(F.xxhash64("doc_id"), salt_buckets)         (long)

Spark's XxHash64 expression (`org.apache.spark.sql.catalyst.expressions.
XXH64`, a Java port of Yann Collet's public XXH64, seed 42) chains multiple
columns by feeding each column's hash in as the next column's seed; int
columns hash their 4 little-endian bytes, longs their 8, strings their
UTF-8 bytes. `functions.hashing.xxhash64` already provides the scalar
byte-path; this module adds

  hash_long_array   vectorized XXH64 of an int64 numpy array (the 8-byte
                    specialization — pure numpy, ~1e8 hashes/sec)
  hash_int_tail     vectorized XXH64 of an int32 array with per-element
                    seeds (the trailing chunk_idx column of the doc_id
                    chain, seeded by the per-file string-prefix hash)
  chain_strings     scalar chained hash of the (repo, path, commit) prefix

Bit-identity with the JVM is asserted in tests/test_p1_direct.py over
strings, ints, longs and the full 4-column doc_id chain.
"""

from __future__ import annotations

import numpy as np

from quickb_spark.functions.hashing import xxhash64 as _xxh_bytes

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

__all__ = ["hash_long_array", "hash_int_tail", "chain_strings"]


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def hash_long_array(vals: np.ndarray, seed: int = 42) -> np.ndarray:
    """XXH64 of each int64 (Spark's hashLong path: the 8-LE-byte input),
    -> int64 array. `seed` is a scalar (Spark's default 42)."""
    v = vals.astype(np.int64, copy=False).view(np.uint64)
    with np.errstate(over="ignore"):
        h = np.uint64(np.uint64(seed & (2**64 - 1)) + _P5 + np.uint64(8))
        h = h ^ (_rotl(v * _P2, 31) * _P1)
        h = _rotl(h, 27) * _P1 + _P4
        return _fmix(h).view(np.int64)


def hash_int_tail(ints: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """XXH64 of each int32 (Spark's hashInt path: 4 LE bytes) with a
    PER-ELEMENT seed — the last link of a chained multi-column hash.
    -> int64 array."""
    i32 = ints.astype(np.int64, copy=False) & np.int64(0xFFFFFFFF)
    u = i32.view(np.uint64)
    s = seeds.astype(np.int64, copy=False).view(np.uint64)
    with np.errstate(over="ignore"):
        h = s + _P5 + np.uint64(4)
        h = h ^ (u * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        return _fmix(h).view(np.int64)


def chain_strings(parts: tuple[str, ...], seed: int = 42) -> int:
    """Chained XXH64 over string columns (each hash seeds the next), the
    Spark multi-column convention. -> signed int64."""
    h = seed
    for p in parts:
        h = _xxh_bytes(p, seed=h & (2**64 - 1))
    return h
