"""Vectorized Bloom filter for broadcast semi-join pushdown.

The 100 TB shuffle-reduction pattern: when the probe side of a semi-join
is huge and the key side is merely large (too big for an exact ``is_in``
value-set broadcast at ~1e8+ keys, where a 1%-FP Bloom is ~10 bits/key
vs 64+ for exact), build the filter ONCE from the key side, ``ray.put``
it, and pre-filter probe batches before the hash-shuffle join. False
positives only let a few extra rows into the join (which discards them);
false negatives are impossible, so the joined result is exactly the
semi-join.

Pure numpy, no Python loops: double hashing h1 + i*h2 (Kirsch-
Mitzenmacher construction) over splitmix64-mixed keys.
"""

from __future__ import annotations

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — the repo-wide integer mixer (same family as
    functions/minhash.py); full-width uint64, overflow intentional."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
        return x ^ (x >> np.uint64(31))


class BloomFilter:
    """Fixed-size Bloom filter over int64/uint64 keys.

    ``n_bits`` is rounded up to a multiple of 64. For target false-
    positive rate p with n keys: n_bits ~= -n ln(p)/(ln 2)^2 and
    n_hashes ~= (n_bits/n) ln 2 — ``BloomFilter.sized(n, p)`` does the
    arithmetic."""

    def __init__(self, n_bits: int, n_hashes: int):
        n_words = max(1, (int(n_bits) + 63) // 64)
        self.n_bits = np.uint64(n_words * 64)
        self.n_hashes = int(n_hashes)
        self.words = np.zeros(n_words, np.uint64)

    @classmethod
    def sized(cls, n_keys: int, fp_rate: float = 0.01) -> "BloomFilter":
        n_keys = max(1, int(n_keys))
        ln2 = np.log(2.0)
        n_bits = int(np.ceil(-n_keys * np.log(fp_rate) / (ln2 * ln2)))
        n_hashes = max(1, int(round(n_bits / n_keys * ln2)))
        return cls(n_bits, n_hashes)

    def _indices(self, keys: np.ndarray) -> np.ndarray:
        """[len(keys), n_hashes] bit indices via double hashing."""
        k = np.ascontiguousarray(keys).astype(np.uint64, copy=False)
        h1 = _splitmix64(k)
        h2 = _splitmix64(k ^ np.uint64(0xA24BAED4963EE407)) | np.uint64(1)
        i = np.arange(self.n_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return (h1[:, None] + i[None, :] * h2[:, None]) % self.n_bits

    def add(self, keys: np.ndarray) -> None:
        self.set_bits(self._indices(keys).reshape(-1))

    def bit_positions(self, keys: np.ndarray) -> np.ndarray:
        """Unique bit indices this key batch would set — the mergeable
        partial-filter representation. Bounded by len(keys) * n_hashes
        entries (vs n_bits/8 bytes for a full filter blob), so the
        distributed build's merge traffic scales with the KEYS, not with
        n_batches x filter size."""
        return np.unique(self._indices(keys).reshape(-1))

    def set_bits(self, positions: np.ndarray) -> None:
        """Scatter bit indices (as produced by ``bit_positions``)."""
        idx = np.ascontiguousarray(positions).astype(np.uint64, copy=False)
        np.bitwise_or.at(self.words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership mask (no false negatives)."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(keys)
        bits = (self.words[(idx >> np.uint64(6)).astype(np.int64)]
                >> (idx & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=1)
